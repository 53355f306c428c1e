"""Regression guard for the multichip communication structure: the
sharded render's per-bounce program must stay collective-free (rays are
shard-local; only the film reduction crosses chips). The audit caught
GSPMD inserting per-iteration all-gathers into the traversal loop once —
keep it from coming back."""

import json
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_bounce_programs_collective_free(tmp_path):
    out = tmp_path / "scaling.json"
    r = subprocess.run(
        [sys.executable, "-u", "benchmarks/scaling.py", "--save", str(out),
         "--width", "32", "--height", "32"],
        capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    meta = json.loads(out.read_text())
    for row in meta["rows"]:
        # both traversal structures: binary lockstep AND the 8-wide
        # packet kernel (r5 — the production path under shard_map)
        assert set(row["bounce_collectives"]) == {"binary", "bvh8_packet"}
        for stats in row["bounce_collectives"].values():
            assert not stats["counts"], row
    # film reduction present (and only there) on real multi-device meshes
    multi = [r_ for r_ in meta["rows"] if r_["devices"] > 1]
    assert multi and all(
        r_["film_collectives"]["counts"].get("all-reduce", 0) >= 1
        for r_ in multi
    )
