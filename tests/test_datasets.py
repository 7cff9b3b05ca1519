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


@pytest.mark.slow
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

    def _instantiate_ds(self, bids_root, artifact_probs=None):
        cfg = resolve_interpolations(load_yaml("configs/dataset/synth_train.yaml"))
        # rewire to the fixture tree and small shape
        cfg["bids_path"] = str(bids_root)
        cfg["seed_path"] = str(bids_root / "derivatives" / "seeds")
        gen = cfg["generator"]
        gen["shape"] = list(SHAPE)
        gen["spatial_deform"]["size"] = list(SHAPE)
        gen["intensity_generator"]["max_subclusters"] = 2
        if artifact_probs is not None:
            for k in ("blur_cortex", "struct_noise", "simulate_motion", "boundaries"):
                if k in gen and isinstance(gen[k], dict) and "prob" in gen[k]:
                    gen[k]["prob"] = artifact_probs
        from fetalsyngen_tpu.config import instantiate

        generator = instantiate(gen)
        cfg.pop("generator")
        return instantiate(cfg, generator=generator)

    def test_full_instantiate(self, bids_root):
        # Artifact probs forced to 0 so the quick gate never pays the
        # minutes-long cold SimulateMotion compile; the artifact-enabled
        # sample path is covered by test_full_instantiate_with_artifacts.
        ds = self._instantiate_ds(bids_root, artifact_probs=0.0)
        assert isinstance(ds, FetalSynthDataset)
        item = ds[0]
        assert item["image"].shape == (1, *SHAPE)

    @pytest.mark.slow
    def test_full_instantiate_with_artifacts(self, bids_root):
        ds = self._instantiate_ds(bids_root, artifact_probs=1.0)
        item = ds[0]
        assert item["image"].shape == (1, *SHAPE)


@pytest.mark.slow
class TestGenerateAugment:
    """Standalone ``generate``/``augment`` public methods
    (reference ``model.py:94-159`` / ``:161-229``)."""

    def test_generate_then_augment_equals_sample(self, bids_root):
        import jax

        from fetalsyngen_tpu.io import nifti

        gen = small_generator()
        ds = FetalSynthDataset(
            str(bids_root), gen, str(bids_root / "derivatives" / "seeds")
        )
        seg = nifti.load_ras(ds.segm_paths[0]).data
        seeds = ds.seed_paths[SUBJECTS[0]]
        key = jax.random.PRNGKey(7)

        out_s, seg_s, _, params_s = gen.sample(None, seg, seeds, key=key)
        out_g, seg_g, _, params_g = gen.generate(None, seg, seeds, key=key)
        out_a, params_a = gen.augment(out_g, seg_g, key=key)

        np.testing.assert_allclose(
            np.asarray(out_a), np.asarray(out_s), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(seg_g), np.asarray(seg_s))
        assert "deform_params" in params_g and "gamma_params" not in params_g
        assert "gamma_params" in params_a and "deform_params" not in params_a
        assert params_g["selected_seeds"] == params_s["selected_seeds"]

    def test_generate_replays_from_params(self, bids_root):
        import jax

        from fetalsyngen_tpu.io import nifti

        gen = small_generator()
        ds = FetalSynthDataset(
            str(bids_root), gen, str(bids_root / "derivatives" / "seeds")
        )
        seg = nifti.load_ras(ds.segm_paths[0]).data
        seeds = ds.seed_paths[SUBJECTS[0]]

        out1, seg1, _, params = gen.generate(None, seg, seeds, key=jax.random.PRNGKey(3))
        out2, seg2, _, _ = gen.generate(None, seg, seeds, genparams=params)
        np.testing.assert_allclose(np.asarray(out2), np.asarray(out1), rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(seg2), np.asarray(seg1))

    def test_augment_replays_own_artifact_dict(self, bids_root):
        """``augment`` writes artifact metadata under ``"artifacts"`` and must
        READ the same key back: replaying augment's own returned dict with a
        FRESH key pins the artifact scalars (nblur here)."""
        import jax

        from fetalsyngen_tpu.generator.artifacts.quality import BlurCortex
        from fetalsyngen_tpu.io import nifti

        gen = small_generator()
        gen.artifacts["blur_cortex"] = BlurCortex(
            prob=0.0, cortex_label=2, nblur_min=3, nblur_max=30
        )
        ds = FetalSynthDataset(
            str(bids_root), gen, str(bids_root / "derivatives" / "seeds")
        )
        seg = nifti.load_ras(ds.segm_paths[0]).data
        seeds = ds.seed_paths[SUBJECTS[0]]
        out_g, seg_g, _, _ = gen.generate(None, seg, seeds, key=jax.random.PRNGKey(9))

        pinned = {"artifacts": {"blur_cortex": {"nblur": 17}}}
        # prob=0 -> without the pin the artifact never fires; the pin both
        # forces it on (genparams contract) and fixes the scalar, even under
        # a fresh key
        _, params_a = gen.augment(out_g, seg_g, genparams=pinned, key=jax.random.PRNGKey(11))
        assert params_a["artifacts"]["blur_cortex"]["nblur"] == 17
        # full roundtrip: replaying augment's own returned dict re-pins
        _, params_b = gen.augment(
            out_g, seg_g, genparams=params_a, key=jax.random.PRNGKey(12)
        )
        assert params_b["artifacts"]["blur_cortex"]["nblur"] == 17


class TestHostSeedCache:
    def test_byte_budget_bounds_ram(self):
        from fetalsyngen_tpu.generator.model import _HostSeedCache

        blob = np.zeros(1000, np.int16)  # 2000 bytes each
        loads = []
        cache = _HostSeedCache(max_bytes=5000, loader=lambda p: (loads.append(p), blob)[1])
        for i in range(10):
            cache.get(f"p{i}")
        assert cache.nbytes <= 5000 - 1000  # two entries resident
        assert len(cache) == 2
        cache.get("p9")  # hit: no reload
        assert loads.count("p9") == 1
        cache.get("p0")  # evicted earlier: reloads
        assert loads.count("p0") == 2


@pytest.mark.slow
class TestArtifactReplayEndToEnd:
    def test_dataset_replay_with_artifacts(self, bids_root):
        """Full dataset replay including the SR-artifact chain — the path
        the production synth_train.yaml config exercises."""
        import fetalsyngen_tpu.generator.artifacts.scanner as sc
        from fetalsyngen_tpu.generator.artifacts.quality import (
            BlurCortex,
            ReconMergeParams,
        )

        gen = small_generator()
        gen.artifacts["blur_cortex"] = BlurCortex(
            prob=1.0, cortex_label=2, nblur_min=3, nblur_max=6
        )
        gen.artifacts["simulate_motion"] = sc.SimulateMotion(
            prob=1.0,
            tiers=(64,),
            ns_grid=32,
            scanner_params=sc.ScannerParams(
                1.0, 1.5, 2.0, 1.0, 1.5, 1.0, 1.5, 1, 1, 200, 0, 0.0, 1, 1,
                0.0, 0.0, 0.05, None, False, 0.0,
            ),
            recon_params=sc.ReconParams(
                0.0, 0.1, 0.0, 0.0, 0.0, 0.0, 0.1, 0.4, 0.0,
                ReconMergeParams(
                    "perlin", perlin_res_list=[1], perlin_octaves_list=[1],
                    perlin_persistence=0.5, perlin_lacunarity=2,
                    perlin_increase_size=0.25,
                ),
            ),
        )
        ds = FetalSynthDataset(
            str(bids_root), gen, str(bids_root / "derivatives" / "seeds")
        )
        first = ds.sample_with_meta(0)
        replay = ds.sample_with_meta(0, genparams=first["generation_params"])
        np.testing.assert_allclose(
            replay["image"], first["image"], rtol=1e-4, atol=1e-5
        )
        np.testing.assert_array_equal(replay["label"], first["label"])


@pytest.mark.slow
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
