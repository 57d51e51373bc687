"""True multi-process distributed run: 2 coordinated CPU processes.

Launches ``tests/distributed_worker.py`` twice (coordinator + worker,
``jax.distributed.initialize``), each with 4 virtual CPU devices, chains
sharded across processes, and asserts:

* both ranks complete and agree on every cross-mesh reduction
  (posterior mean, split R-hat, explicit shard_map psum, acceptance);
* the 2-process results match a single-process run of the same global
  program (layout-independence = the "linear chain scaling to 2+ hosts"
  contract of BASELINE.json, SURVEY.md section 2.4);
* per-process checkpoint shards (``ckpt.npz.p0/.p1``) are written and
  round-trip each rank's local chain slice.
"""

import json
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

WORKER = Path(__file__).parent / "distributed_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _launch(num_processes: int, out_dir: Path) -> list[dict]:
    port = _free_port()
    out_dir.mkdir(parents=True, exist_ok=True)
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                str(WORKER),
                "--process-id", str(pid),
                "--num-processes", str(num_processes),
                "--coordinator", f"localhost:{port}",
                "--out-dir", str(out_dir),
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(num_processes)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-3000:]}"
    return [
        json.loads((out_dir / f"out.p{pid}.json").read_text())
        for pid in range(num_processes)
    ]


@pytest.mark.slow
def test_two_process_distributed_matches_single_process(tmp_path):
    two = _launch(2, tmp_path / "np2")
    one = _launch(1, tmp_path / "np1")[0]

    assert two[0]["global_devices"] == 8 and two[0]["local_devices"] == 4
    assert one["global_devices"] == 4

    # Both ranks see identical reduced values (the reductions are global).
    np.testing.assert_allclose(two[0]["posterior_mean"], two[1]["posterior_mean"], rtol=1e-6)
    np.testing.assert_allclose(two[0]["rhat"], two[1]["rhat"], rtol=1e-6)
    np.testing.assert_allclose(two[0]["pooled_mean"], two[1]["pooled_mean"], rtol=1e-6)

    # 2-process == 1-process (layout independence of the global program).
    np.testing.assert_allclose(two[0]["posterior_mean"], one["posterior_mean"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(two[0]["rhat"], one["rhat"], rtol=1e-3)
    np.testing.assert_allclose(two[0]["accept"], one["accept"], rtol=1e-4)
    # shard_map psum pooled mean == GSPMD posterior mean.
    np.testing.assert_allclose(two[0]["pooled_mean"], two[0]["posterior_mean"],
                               rtol=1e-5, atol=1e-6)

    # Sanity: the run actually mixed (R-hat near 1, acceptance reasonable).
    assert max(two[0]["rhat"]) < 1.2
    assert 0.3 < two[0]["accept"] <= 1.0

    # Per-process checkpoint shards exist and round-tripped locally.
    assert (tmp_path / "np2" / "ckpt.npz.p0").exists()
    assert (tmp_path / "np2" / "ckpt.npz.p1").exists()
    assert two[0]["ckpt_roundtrip_ok"] and two[1]["ckpt_roundtrip_ok"]
    # Single-process saves the unsharded file.
    assert (tmp_path / "np1" / "ckpt.npz").exists()
