"""Reference-name compatibility surface.

The reference exposes per-signal functions plus ``*all`` batch wrappers that
serially loop ``eachslice`` (/root/reference/src/mod/dwt/dwt_all.jl:39-54 and
the swt/acwt analogs).  In this framework *every* transform is natively
batched over leading axes, so each ``*all`` name simply aliases the batched
core — one jitted program instead of a serial loop.  Layout note: the
reference stacks signals on the LAST axis (Julia column-major); here the
batch axis is FIRST (row-major TPU layout).

This module exists so a WaveletsExt.jl user can find every reference export
under its familiar name.
"""

from .transforms.dwt import (dwt, idwt, dwt2, idwt2, wpt, iwpt, wpt2, iwpt2,
                             wpd, iwpd, wpd2, iwpd2)
from .transforms.swt import (sdwt, sdwt2, isdwt, isdwt2, swpt, swpt2, iswpt,
                             iswpt2, swpd, swpd2, iswpd, iswpd2)
from .transforms.acwt import (acdwt, acdwt2, iacdwt, iacdwt2, acwpt, acwpt2,
                              iacwpt, iacwpt2, acwpd, acwpd2, iacwpd, iacwpd2)

# --- batch "all" aliases (batched natively; dwt_all.jl:39-54 etc.) ---------
dwtall, idwtall = dwt, idwt
wptall, iwptall = wpt, iwpt
wpdall, iwpdall = wpd, iwpd
sdwtall, isdwtall = sdwt, isdwt
swptall, iswptall = swpt, iswpt
swpdall, iswpdall = swpd, iswpd
acdwtall, iacdwtall = acdwt, iacdwt
acwptall, iacwptall = acwpt, iacwpt
acwpdall, iacwpdall = acwpd, iacwpd

# 2-D variants
dwt2all, idwt2all = dwt2, idwt2
wpt2all, iwpt2all = wpt2, iwpt2
wpd2all, iwpd2all = wpd2, iwpd2

__all__ = [n for n in dir() if not n.startswith("_")]
