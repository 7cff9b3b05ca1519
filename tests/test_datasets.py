"""Dataset + config-system integration tests on a procedural mini-BIDS tree."""

import numpy as np
import pytest

from fetalsyngen_tpu.config import load_and_instantiate, load_yaml, resolve_interpolations
from fetalsyngen_tpu.data.datasets import FetalSynthDataset, FetalTestDataset
from fetalsyngen_tpu.generator.model import (
    FetalSynthGen,
    ImageFromSeeds,
    RandBiasField,
    RandGamma,
    RandNoise,
    RandResample,
    SpatialDeformation,
)

from fixtures import SHAPE, SUBJECTS, build_bids_tree

LABELS = [0] + list(range(10, 50))
GEN_CLASSES = [0] + [10] * 10 + [20] * 10 + [30] * 10 + list(range(40, 50))


@pytest.fixture(scope="module")
def bids_root(tmp_path_factory):
    return build_bids_tree(tmp_path_factory.mktemp("bids"))


def small_generator():
    return FetalSynthGen(
        shape=SHAPE,
        resolution=(0.5, 0.5, 0.5),
        intensity_generator=ImageFromSeeds(1, 2, LABELS, GEN_CLASSES),
        spatial_deform=SpatialDeformation(20, 0.02, 0.1, SHAPE, 0.9, True, 0.03, 0.06, 4.0, 0.5),
        resampler=RandResample(0.9, 0.5, 1.5),
        bias_field=RandBiasField(0.9, 0.004, 0.02, 0.01, 0.3),
        noise=RandNoise(0.9, 5, 15),
        gamma=RandGamma(0.9, 0.1),
        seed=0,
    )


class TestSynthDataset:
    def test_discovery(self, bids_root):
        ds = FetalSynthDataset(
            str(bids_root), small_generator(), str(bids_root / "derivatives" / "seeds")
        )
        assert len(ds) == len(SUBJECTS)
        assert set(ds.seed_paths.keys()) == set(SUBJECTS)
        assert set(ds.seed_paths[SUBJECTS[0]].keys()) == {1, 2}

    def test_getitem_contract(self, bids_root):
        ds = FetalSynthDataset(
            str(bids_root), small_generator(), str(bids_root / "derivatives" / "seeds")
        )
        item = ds[0]
        img, lab = item["image"], item["label"]
        assert img.shape == (1, *SHAPE) and img.dtype == np.float32
        assert lab.shape == (1, *SHAPE) and lab.dtype == np.int64
        assert 0.0 <= img.min() and img.max() <= 1.0 and img.max() == pytest.approx(1.0)
        assert item["name"] == SUBJECTS[0]
        assert "generation_time" in ds.generation_params

    def test_genparams_replay_end_to_end(self, bids_root):
        """sample_with_meta -> replay by genparams gives identical volumes."""
        ds = FetalSynthDataset(
            str(bids_root), small_generator(), str(bids_root / "derivatives" / "seeds")
        )
        first = ds.sample_with_meta(1)
        gp = first["generation_params"]
        second = ds.sample_with_meta(1, genparams=gp)
        np.testing.assert_allclose(second["image"], first["image"], rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(second["label"], first["label"])
        assert (
            second["generation_params"]["selected_seeds"]
            == gp["selected_seeds"]
        )

    def test_sub_list_filter(self, bids_root):
        ds = FetalSynthDataset(
            str(bids_root),
            small_generator(),
            str(bids_root / "derivatives" / "seeds"),
            sub_list=[SUBJECTS[0]],
        )
        assert len(ds) == 1

    def test_image_as_intensity(self, bids_root):
        ds = FetalSynthDataset(
            str(bids_root),
            small_generator(),
            seed_path=None,
            load_image=True,
            image_as_intensity=True,
        )
        item = ds[0]
        assert item["image"].shape == (1, *SHAPE)
        assert np.isfinite(item["image"]).all()


class TestTestDataset:
    def test_plain_load(self, bids_root):
        ds = FetalTestDataset(str(bids_root))
        item = ds[0]
        assert item["image"].shape == (1, *SHAPE)
        assert item["label"].dtype == np.int64

    def test_with_transforms_and_inverse(self, bids_root):
        tf = load_and_instantiate("configs/dataset/transforms/inference.yaml")
        # use a smaller pad/crop target fitting the fixture
        for t in tf.transforms:
            if hasattr(t, "spatial_size"):
                t.spatial_size = (72, 72, 72)
            if hasattr(t, "roi_size"):
                t.roi_size = (72, 72, 72)
        ds = FetalTestDataset(str(bids_root), transforms=tf)
        item = ds[0]
        assert item["image"].shape == (1, 72, 72, 72)
        assert item["image"].max() <= 1.0
        rev = ds.reverse_transform(dict(item))
        assert rev["image"].shape == (1, *SHAPE)


class TestConfigSystem:
    def test_interpolation_and_defaults(self, bids_root):
        cfg = load_yaml("configs/dataset/synth_train.yaml")
        cfg = resolve_interpolations(cfg)
        gen = cfg["generator"]
        assert gen["spatial_deform"]["size"] == [256, 256, 256]
        assert gen["spatial_deform"]["device"] is None  # interpolated from ${..device}

    def test_full_instantiate(self, bids_root):
        cfg = resolve_interpolations(load_yaml("configs/dataset/synth_train.yaml"))
        # rewire to the fixture tree and small shape
        cfg["bids_path"] = str(bids_root)
        cfg["seed_path"] = str(bids_root / "derivatives" / "seeds")
        gen = cfg["generator"]
        gen["shape"] = list(SHAPE)
        gen["spatial_deform"]["size"] = list(SHAPE)
        gen["intensity_generator"]["max_subclusters"] = 2
        from fetalsyngen_tpu.config import instantiate

        generator = instantiate(gen)
        cfg.pop("generator")
        ds = instantiate(cfg, generator=generator)
        assert isinstance(ds, FetalSynthDataset)
        item = ds[0]
        assert item["image"].shape == (1, *SHAPE)


class TestGenparamsSerialization:
    def test_genparams_json_roundtrip(self, bids_root):
        """generation_params must serialize to JSON (the test.py dump path)
        and replay after a JSON roundtrip."""
        import json

        import numpy as np

        ds = FetalSynthDataset(
            str(bids_root), small_generator(), str(bids_root / "derivatives" / "seeds")
        )
        first = ds.sample_with_meta(0)
        gp = first["generation_params"]
        s = json.dumps(gp, default=lambda o: np.asarray(o).tolist())
        gp2 = json.loads(s)
        second = ds.sample_with_meta(0, genparams=gp2)
        np.testing.assert_allclose(second["image"], first["image"], rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(second["label"], first["label"])
