"""Smoke tests for the committed production launcher (tools/syn_long_run.py).

The launcher is what actually drives the 30k-step SYN_LONG production runs
(docs/validation_run.md); these tests run it end-to-end on CPU at smoke
sizes — scene generation, config assembly (incl. the sc_stride / hier
variant plumbing), Trainer fit, and the --resume discovery path.
"""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOLS = os.path.join(REPO, "tools")
if TOOLS not in sys.path:
    sys.path.insert(0, TOOLS)

from syn_long_run import main as launcher_main  # noqa: E402

SMOKE = [
    "--steps", "16", "--batch", "64", "--units", "16",
    "--img-size", "24", "--n-train", "2", "--n-test", "1",
    "--tie-points", "50", "--val-every", "1000",
]


def _run_dirs(out_root):
    ws = os.path.join(out_root, "training")
    return sorted(os.listdir(ws)) if os.path.isdir(ws) else []


def test_launcher_smoke_sc_stride(tmp_path):
    out = str(tmp_path / "run")
    rc = launcher_main([out, "--seed", "3", "--sc-stride", "2"] + SMOKE)
    assert rc == 0
    assert os.path.isfile(os.path.join(out, "scene", "root.json"))
    runs = _run_dirs(out)
    assert len(runs) == 1
    # the sc_stride variant must be visible in the run name (postfix) and
    # recorded in the dumped pipeline config for reload/resume
    assert "sc2" in runs[0]
    run_dp = os.path.join(out, "training", runs[0])
    cfg_fp = os.path.join(run_dp, "configs", "pipeline.toml")
    assert os.path.isfile(cfg_fp)
    with open(cfg_fp) as f:
        assert "sc_stride = 2" in f.read()
    ckpt_dp = os.path.join(run_dp, "ckpoints")
    assert os.path.isdir(ckpt_dp) and os.listdir(ckpt_dp)

    # --resume discovers the run dir and exits cleanly (steps already met);
    # full resume-trajectory semantics are covered by tests/test_preemption.py
    rc = launcher_main([out, "--resume"])
    assert rc == 0


def test_launcher_resume_without_run_fails(tmp_path):
    out = str(tmp_path / "empty")
    os.makedirs(os.path.join(out, "training"))
    assert launcher_main([out, "--resume"]) == 1


@pytest.mark.slow
def test_launcher_smoke_hierarchical(tmp_path):
    out = str(tmp_path / "hier")
    rc = launcher_main(
        [out, "--seed", "3", "--n-importance", "4", "--use-fine-network"]
        + SMOKE
    )
    assert rc == 0
    runs = _run_dirs(out)
    assert len(runs) == 1 and "hier" in runs[0]
    cfg_fp = os.path.join(out, "training", runs[0], "configs", "pipeline.toml")
    with open(cfg_fp) as f:
        txt = f.read()
    assert "n_importance = 4" in txt
    assert "use_fine_network = true" in txt
    # the smoke --batch override must win over the hier batch drop
    assert "batch_size = 64" in txt


def test_four_scenes_workflow_smoke(tmp_path):
    """The reference's primary user loop (one run per area -> gathered
    comparison table) end-to-end on two tiny synthetic regimes."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from four_scenes import main as four_main

    root = str(tmp_path / "four")
    rc = four_main([
        root, "--steps", "8", "--img-size", "24", "--n-train", "2",
        "--n-test", "1", "--batch", "64", "--units", "32",
        "--n-samples", "8", "--tie-points", "60",
        "--scenes", "SYN_SUBURB,SYN_RESIDENT",
    ])
    assert rc == 0
    table_fp = os.path.join(root, "gathered_four_scenes.txt")
    assert os.path.isfile(table_fp)
    table = open(table_fp).read()
    assert "SYN_SUBURB" in table and "SYN_RESIDENT" in table
    assert "PSNR" in table and "mIoU" in table
