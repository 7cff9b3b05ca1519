"""End-to-end generation from REAL fetal anatomy — the in-repo fixture.

The reference repo ships a sample subject so everything runs out-of-the-box
(`/root/reference/data`, wired via ``configs/dataset/real_train.yaml:5``,
``bids_path: ./data``). This repo packages the same subject, re-encoded
through its own NIfTI writer (``data/README.md``), and these tests run
WITHOUT the reference checkout — unlike ``test_reference_ab.py``, which
needs the reference's torch code for A/B and skips when it is absent.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

REAL_BIDS = Path(__file__).resolve().parents[1] / "data"

pytestmark = pytest.mark.skipif(
    not (REAL_BIDS / "sub-sta21" / "anat" / "sub-sta21_rec-irtk_T2w_dseg.nii.gz").exists(),
    reason="in-repo data/ fixture not present",
)


def test_real_train_config_discovers_fixture():
    """``configs/dataset/real_train.yaml`` (bids_path ./data) resolves the
    packaged subject: BIDS discovery, seed-tree indexing, error semantics."""
    from fetalsyngen_tpu.config import instantiate, load_yaml, resolve_interpolations

    cfg = resolve_interpolations(load_yaml("configs/dataset/real_train.yaml"))
    gen_cfg = cfg.pop("generator")
    for k in ("blur_cortex", "struct_noise", "simulate_motion", "boundaries"):
        gen_cfg.pop(k, None)
    cfg["bids_path"] = str(REAL_BIDS)
    cfg["seed_path"] = str(REAL_BIDS / "derivatives" / "seeds")
    cfg["image_as_intensity"] = False
    ds = instantiate(cfg, generator=instantiate(gen_cfg))
    assert len(ds) == 1
    name = ds._sub_ses_idx(0)
    assert name == "sub-sta21"
    # full seed tree indexed: subclasses 1..6 x meta-labels 1..4
    assert sorted(ds.seed_paths[name].keys()) == [1, 2, 3, 4, 5, 6]
    assert sorted(ds.seed_paths[name][3].keys()) == [1, 2, 3, 4]


@pytest.mark.slow
def test_real_anatomy_generation_and_replay():
    """Generate from the real seed tree through the dataset API, sanity-assert
    the output, then replay it voxel-exactly from the returned genparams
    (reference contract ``datasets.py:256-327``, docs "Fixed Image
    Generation")."""
    from fetalsyngen_tpu.config import instantiate, load_yaml, resolve_interpolations
    from fetalsyngen_tpu.data.datasets import FetalSynthDataset

    gen_cfg = resolve_interpolations(load_yaml("configs/dataset/generator/default.yaml"))
    # core pipeline only: the SR-artifact chain is covered elsewhere and
    # would dominate CPU runtime at 256^3
    for k in ("blur_cortex", "struct_noise", "simulate_motion", "boundaries"):
        gen_cfg.pop(k, None)
    generator = instantiate(gen_cfg)

    ds = FetalSynthDataset(
        str(REAL_BIDS),
        generator,
        str(REAL_BIDS / "derivatives" / "seeds"),
        sub_list=["sub-sta21"],
    )
    assert len(ds) == 1

    data, params = ds.sample(0)
    img, lab = data["image"], data["label"]
    assert img.shape == (1, 256, 256, 256) and lab.shape == (1, 256, 256, 256)
    assert np.all(np.isfinite(img))
    assert 0.0 <= img.min() and img.max() <= 1.0

    # anatomy sanity: a fetal brain occupies a plausible fraction of the FOV
    # and carries several tissue labels
    brain_frac = float(np.mean(lab > 0))
    assert 0.005 < brain_frac < 0.6, f"brain fraction {brain_frac}"
    assert len(np.unique(lab)) >= 5
    # the image has actual contrast inside the brain
    inside = img[lab > 0]
    assert inside.std() > 0.01

    # replay contract: the returned genparams re-create the sample, here
    # voxel-exactly because the PRNG key is embedded
    data2, _ = ds.sample(0, genparams=params)
    np.testing.assert_array_equal(data["label"], data2["label"])
    np.testing.assert_array_equal(data["image"], data2["image"])
