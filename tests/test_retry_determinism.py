"""Task-retry determinism (tools/retry_probe.py end-to-end).

Plain ``local[N]`` never exercises task retries (maxFailures=1), so
the engine's behavior under the retries that are ROUTINE at cluster
scale is otherwise untested.  The probe runs in a subprocess because
it needs its own ``local[4, 4]`` master, which cannot coexist with
the session fixture's JVM.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_retry_probe_deterministic():
    out = subprocess.run(
        [sys.executable, "tools/retry_probe.py"],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = json.loads(out.stdout.strip().splitlines()[-1])
    assert line["ok"] is True
    assert set(line["pipelines"]) == {
        "minhash_pairs_upstream",
        "keyed_agg_upstream",
        "post_shuffle_downstream",
    }
    for name, rec in line["pipelines"].items():
        # Vacuity guard: the injected failure must actually have fired,
        # and the retried run must match the clean run exactly.
        assert rec["injections"] >= 1, name
        assert rec["equal"] is True, name
        assert rec["rows"] > 0, name
