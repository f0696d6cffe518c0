"""Stage-3 composition golden: the reference's training_step sample merge
(concat + sort + double fancy-gather + _raw2outputs + fg/bg ray split,
ref: 3rd_Complete_HOSNeRF/src/model/mipnerf360/model.py:1524-1596,
executed in place by tools/ref_merge_dump.py on fabricated streams) vs
`models/composed.compose` — BOTH the sortless factorized path and the
sort path. Locks the z-recovery semantics (model.py:1526-1545), the fg
threshold, the tie/order rules, and the human-weight re-extraction
(model.py:1575,1588) that the flow loss consumes.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/3rd_Complete_HOSNeRF"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference unavailable")


@pytest.fixture(scope="module")
def golden(tmp_path_factory):
    d = tmp_path_factory.mktemp("ref_merge")
    npz = str(d / "ref_merge.npz")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "ref_merge_dump.py"),
         npz],
        capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    return np.load(npz)


@pytest.fixture(scope="module")
def streams():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import ref_merge_dump
    return ref_merge_dump.fabricate()


@pytest.mark.parametrize("sortless", [True, False])
def test_compose_matches_reference_merge(golden, streams, sortless):
    import jax.numpy as jnp

    from hosnerf_tpu.models import composed

    d = {k: jnp.asarray(v) for k, v in streams.items()}
    scene_level = {"rgb": d["bkg_rgb"], "density": d["bkg_density"],
                   "tdist": d["tdist"]}
    human_out = {"human_rgb": d["hum_rgb"],
                 "human_density": d["hum_density"],
                 "newsmpl_pts": d["newsmpl_pts"],
                 "pts_mask": d["pts_mask"]}
    batch = {"rays_o_bkg": d["rays_o"], "rays_d_bkg": d["rays_d"],
             "newsmpl_to_scale_world": jnp.eye(4)}
    out = composed.compose(scene_level, human_out, batch,
                           sortless=sortless)

    idx_fg = golden["idx_fg"]
    np.testing.assert_array_equal(np.asarray(out["idx_fg"]), idx_fg)
    np.testing.assert_allclose(np.asarray(out["rgb"]), golden["rgb"],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["acc"])[idx_fg],
                               golden["alpha_fg"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["acc"])[~idx_fg],
                               golden["alpha_bg"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["depth"])[idx_fg],
                               golden["depth_fg"], atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["depth"])[~idx_fg],
                               golden["depth_bg"], atol=1e-4, rtol=1e-5)
    # the flow loss consumes these (model.py:1575,1588)
    np.testing.assert_allclose(
        np.asarray(out["human_weights"])[idx_fg],
        golden["human_weights_fg"], atol=1e-5)
    # bg rays' human weights are zeroed by the fg gate
    assert float(np.abs(np.asarray(out["human_weights"])[~idx_fg]).max()) \
        == 0.0
