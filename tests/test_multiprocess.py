"""Multi-PROCESS distributed smoke (SURVEY.md §4 item 4; VERDICT r2 item 8).

Launches scripts/multiproc_smoke.py: two jax.distributed CPU processes on
this machine run the sharded encode -> ordered cross-process member gather ->
GF(2) checksum combine -> verified gzip concatenation. Guarded by
JDT_MP_TESTS=1 (spawns subprocesses with their own jax compile, ~2 min;
the verify skill runs it)."""
import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("JDT_MP_TESTS") != "1",
    reason="multi-process smoke; set JDT_MP_TESTS=1 (verify skill)")


def test_two_process_member_gather():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "multiproc_smoke.py")],
        capture_output=True, timeout=600)
    line = r.stdout.decode().strip().splitlines()[-1]
    res = json.loads(line)
    assert res["ok"] and res["combined_crc_ok"], res
