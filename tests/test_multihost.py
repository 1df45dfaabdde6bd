"""Multi-HOST sharding dryrun: two separate ``jax.distributed`` processes
(4 virtual CPU devices each) form one 8-device global mesh and run the
sharded Myers engine plus the cross-chip ring wavefront, asserting equality
with single-process results (SURVEY §7 build-plan step 4 — the mesh dimension
beyond one process). CPU collectives ride gloo.

The orchestration lives in ``__graft_entry__.dryrun_multihost`` so the driver
can exercise the same path via ``SZ_DRYRUN_MULTIHOST=1``.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_multihost_dryrun():
    # Run the orchestrator in a clean subprocess: the pytest process itself
    # already initialized a single-process jax, and the two workers must each
    # initialize jax.distributed from scratch.
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device counts
    code = (
        f"import sys; sys.path.insert(0, {REPO!r}); "
        "import __graft_entry__ as g; g.dryrun_multihost(2, 4)"
    )
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=115)
    assert proc.returncode == 0, (proc.stdout + "\n" + proc.stderr)[-4000:]
    assert "multihost sharded_myers ok" in proc.stdout
    assert "multihost ring_wavefront ok" in proc.stdout
