"""Frozen end-to-end golden regression: points → post-NMS detections.

Pins the COMPOSED pipeline (voxelize → mask → network → decode → top-k →
NMS) on fixed weights and frozen frames, CPU float32 — the formalization of
the reference's own end-to-end cross-check pattern (reference:
framework/inference.py:258-448, infer_v2/v3 validating each other). Per-op
unit oracles cannot catch a refactor that shifts the decode/top-k/NMS
interplay within each op's tolerance; this does.

If this fails after an INTENTIONAL behavior change, regenerate with
`python tools/make_golden.py` and commit the new asset with the change.
A fingerprint mismatch means the weight init itself changed (different
failure; regenerate too, but know that's what moved).
"""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "e2e_small.npz")


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.fail(f"golden asset missing: {GOLDEN} (run tools/make_golden.py)")
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def detector():
    import jax

    import __graft_entry__ as g
    from det3d_tpu.pipeline import Detector

    cfg = g._small_cfg()
    det = Detector(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0))
    return det, variables


def test_param_fingerprint_stable(golden, detector):
    from tools.make_golden import param_fingerprint

    _, variables = detector
    np.testing.assert_allclose(
        param_fingerprint(variables), golden["fingerprint"], rtol=1e-6, atol=1e-8
    )


def test_e2e_detections_frozen(golden, detector):
    import jax

    from tools.make_golden import N_FRAMES

    det, variables = detector
    total = 0
    for i in range(N_FRAMES):
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
