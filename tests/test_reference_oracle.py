"""Smoke-tier run of the reference-as-oracle harness (VERDICT r4 #1).

Executes THE REFERENCE CODE ITSELF (`/root/reference/main_deep_staple.py`,
unmodified except mechanical debug-scale config literals) under the import
shims in `benchmarks/ref_shims/`, and the rebuild, on one shared synthetic
fixture — 3 epochs, so only the mechanical gates are asserted here (instance
ids, snapshot schema through our reader, loss descent, consensus stage on the
reference-produced .pth). The statistical DP-ranking gates need the full
40-epoch schedule: `python benchmarks/reference_oracle.py --epochs 40`
(recorded in ORACLE_REFRUN.json).
"""

import os
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path(os.environ.get("DEEPSTAPLE_REFERENCE_DIR", "/root/reference"))


@pytest.mark.skipif(not REFERENCE.is_dir(), reason="reference tree not present")
def test_reference_code_runs_and_matches_mechanics(tmp_path):
    sys.path.insert(0, str(REPO / "benchmarks"))
    import reference_oracle as ro

    epochs = 3
    ds_dir, art = ro.build_fixture(tmp_path, num_cases=4, atlas_count=2,
                                   size=16, seed=0)
    ref_dir = ro.stage_reference(tmp_path, ds_dir, art, epochs=epochs,
                                 batch_size=2, num_val_images=1,
                                 atlas_count=2, size=16)
    rc, _dt = ro.run_reference(ref_dir, tmp_path, timeout=1800)
    assert rc == 0, (tmp_path / "ref_stdout.log").read_text()[-3000:]

    rc, _dt = ro.run_ours(tmp_path, ds_dir, epochs=epochs, batch_size=2,
                          num_val_images=1, timeout=1800)
    assert rc == 0, (tmp_path / "ours_stdout.log").read_text()[-3000:]

    result = ro.compare(tmp_path, art, epochs)
    # Mechanical gates (statistical DP gates need the 40-epoch schedule):
    assert result["gates"]["instances_match"], result
    assert result["gates"]["snapshot_schema"], result
    assert result["gates"]["both_losses_decrease"], result
    # the rebuild's consensus stage ran on the REFERENCE-produced snapshot
    cd = result["ref_snapshot_consensus_on_rebuild_mean_dice"]
    assert isinstance(cd, float), cd
