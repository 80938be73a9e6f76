"""bench.py driver-contract tests (VERDICT r3 weak #1).

The driver records bench.py's stdout as the round's headline metric; the
contract is ONE parseable JSON line no matter what. BENCH_r03.json was a raw
traceback because (a) `ops/blend_xla.py` initialized the JAX backend at
import time and (b) the headline was printed only after the aux gates. These
tests run bench.py as a subprocess and assert the contract under both a
forced backend failure and a healthy tiny run.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run(args):
    return subprocess.run([sys.executable, "-u", BENCH, *args],
                          capture_output=True, text=True, timeout=600,
                          cwd=REPO)


def _parse_single_json_line(stdout):
    lines = [ln for ln in stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected exactly one stdout line, got: {lines!r}"
    return json.loads(lines[0])


def test_backend_failure_still_emits_json_line():
    """A dead/unknown backend (the r3 tunnel outage) must yield a JSON error
    line + nonzero exit, not a bare traceback."""
    r = _run(["--device", "nonexistent_backend"])
    assert r.returncode != 0
    obj = _parse_single_json_line(r.stdout)
    assert obj["metric"] == "fwd_bwd_mpixels_per_s"
    assert obj["value"] is None
    assert "error" in obj and obj["error"]


def test_smoke_run_emits_headline_before_aux():
    """Happy path on CPU: one JSON line with the metric fields; smoke mode
    must not create/overwrite BENCH_BASELINE.json."""
    base_path = os.path.join(REPO, "BENCH_BASELINE.json")
    before = open(base_path).read() if os.path.exists(base_path) else None
    r = _run(["--device", "cpu", "--smoke"])
    assert r.returncode == 0, r.stderr[-2000:]
    obj = _parse_single_json_line(r.stdout)
    assert obj["metric"] == "fwd_bwd_mpixels_per_s"
    assert obj["value"] is not None and obj["value"] > 0
    assert "vs_target" in obj
    after = open(base_path).read() if os.path.exists(base_path) else None
    assert before == after


def test_package_import_does_not_init_backend():
    """Importing the package (incl. blend_xla) must not touch any JAX
    backend — guard against module-level jnp constants reappearing."""
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'nonexistent_backend')\n"
        "import gs2m_tpu.ops.blend_xla\n"
        "import gs2m_tpu.models.render\n"
        "import gs2m_tpu.train.trainer\n"
        "print('IMPORT_OK')\n"
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=300, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "IMPORT_OK" in r.stdout
