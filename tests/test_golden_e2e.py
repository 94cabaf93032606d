"""Frozen end-to-end golden regression: points → post-NMS detections.

Pins the COMPOSED pipeline (voxelize → mask → network → decode → top-k →
NMS) on fixed weights and frozen frames, CPU float32 — the formalization of
the reference's own end-to-end cross-check pattern (reference:
framework/inference.py:258-448, infer_v2/v3 validating each other). Per-op
unit oracles cannot catch a refactor that shifts the decode/top-k/NMS
interplay within each op's tolerance; this does.

Two assets (tools/make_golden.py): the tiny `small` geometry with exact
top-k, and the 200²-grid `mid` geometry with the TPU-default bucketed
approximate top-k forced on — tiling/padding arithmetic and the approx
selection are pinned there.

If this fails after an INTENTIONAL behavior change, regenerate with
`python tools/make_golden.py` and commit the new asset with the change.
A fingerprint mismatch means the weight init itself changed (different
failure; regenerate too, but know that's what moved).
"""

import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
FRAMES = {"small": 6, "mid": 4}


@pytest.fixture(scope="module", params=["small", "mid"])
def case(request):
    which = request.param
    path = os.path.join(GOLDEN_DIR, f"e2e_{which}.npz")
    if not os.path.exists(path):
        pytest.fail(f"golden asset missing: {path} (run tools/make_golden.py)")
    import jax

    from tools.make_golden import make_detector

    det = make_detector(which)
    variables = det.init_variables(jax.random.PRNGKey(0))
    return which, np.load(path), det, variables


def test_param_fingerprint_stable(case):
    from tools.make_golden import param_fingerprint

    _, golden, _, variables = case
    np.testing.assert_allclose(
        param_fingerprint(variables), golden["fingerprint"], rtol=1e-6, atol=1e-8
    )


def test_e2e_detections_frozen(case):
    import jax

    which, golden, det, variables = case
    total = 0
    for i in range(FRAMES[which]):
        d = jax.device_get(
            det.infer_jit(variables, golden[f"points_{i}"], np.int32(golden[f"num_{i}"]))
        )
        valid = np.asarray(d.valid, bool)
        np.testing.assert_array_equal(valid, golden[f"valid_{i}"], err_msg=f"frame {i}")
        np.testing.assert_allclose(
            np.asarray(d.boxes)[valid],
            golden[f"boxes_{i}"][valid],
            rtol=1e-4,
            atol=1e-4,
            err_msg=f"frame {i}",
        )
        np.testing.assert_allclose(
            np.asarray(d.scores)[valid],
            golden[f"scores_{i}"][valid],
            rtol=1e-5,
            atol=1e-5,
            err_msg=f"frame {i}",
        )
        total += int(valid.sum())
    assert total > 0, "golden frames produced no detections — asset is degenerate"
