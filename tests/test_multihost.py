"""Multi-host runtime test: a REAL 2-process localhost run (gloo CPU
collectives), exercising jax.distributed.initialize, a process-spanning
mesh, per-process batch insertion, the sharded JBB pipeline, and cross-host
result fetch/aggregation.  See waveletsext_tpu/parallel/multihost.py."""

import pathlib
import socket
import subprocess
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]
WORKER = ROOT / "tests" / "mh_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_jbb_pipeline():
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=str(ROOT))
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out}"
        assert f"MH_OK rank={pid} procs=2 devices=4" in out, out
        # explicit CP ring (shard_map ppermute + coset all_to_all) across
        # REAL processes: wpd_cp parity, wpt->iwpt round trip, fused denoise
        assert f"MH_CP_OK rank={pid} ring=4" in out, out
