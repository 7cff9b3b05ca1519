"""Procedural test/bench data: standalone stand-ins for BIDS volumes.

Also builds a tiny on-disk mini-BIDS tree (:func:`build_bids_tree`) with the
same layout as the reference's in-repo ``data/`` fixture
(``sub-*/anat/*_T2w.nii.gz``, ``*_dseg.nii.gz``,
``derivatives/seeds/subclasses_N/sub-*/anat/*_mlabel_M.nii.gz``) from
procedural volumes — packaged so examples and installed-package users can run
the full dataset API without external data or a repo checkout.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

FIXTURE_SHAPE = (64, 64, 64)
FIXTURE_SUBJECTS = ("sub-aaa", "sub-bbb")
FIXTURE_N_SUBCLASSES = (1, 2)


def make_phantom(rng: np.random.Generator, shape=FIXTURE_SHAPE):
    """Sphere-in-sphere phantom: seg labels 0..7, plausible T2w-ish image."""
    zz = np.stack(
        np.meshgrid(*[np.linspace(-1, 1, s) for s in shape], indexing="ij")
    )
    r = np.sqrt((zz**2).sum(0))
    seg = np.zeros(shape, dtype=np.int16)
    seg[r < 0.9] = 1  # CSF
    seg[r < 0.7] = 2  # GM
    seg[r < 0.5] = 3  # WM
    seg[r < 0.2] = 4  # deep
    img = (seg.astype(np.float32) * 60 + rng.normal(0, 5, shape)).clip(0, 255)
    return img.astype(np.float32), seg


def build_bids_tree(
    root: Path, rng: np.random.Generator | None = None, shape=FIXTURE_SHAPE
) -> Path:
    """Write a complete mini-BIDS tree (images, dseg, seed derivative tree)."""
    from .io import nifti

    rng = rng or np.random.default_rng(7)
    affine = np.diag([0.5, 0.5, 0.5, 1.0])
    for sub in FIXTURE_SUBJECTS:
        anat = root / sub / "anat"
        anat.mkdir(parents=True, exist_ok=True)
        img, seg = make_phantom(rng, shape)
        nifti.save(anat / f"{sub}_T2w.nii.gz", img, affine)
        nifti.save(anat / f"{sub}_dseg.nii.gz", seg, affine)
        for n_sub in FIXTURE_N_SUBCLASSES:
            for mlabel in range(1, 5):
                sdir = root / "derivatives" / "seeds" / f"subclasses_{n_sub}" / sub / "anat"
                sdir.mkdir(parents=True, exist_ok=True)
                # seeds for meta-label m live in [10*m, 10*m + n_sub)
                seed = np.zeros(shape, dtype=np.int8)
                region = seg == mlabel
                labels = 10 * mlabel + rng.integers(0, n_sub, size=int(region.sum()))
                seed[region] = labels.astype(np.int8)
                nifti.save(sdir / f"{sub}_dseg_mlabel_{mlabel}.nii.gz", seed, affine)
    return root


def phantom_seeds_and_seg(shape=(256, 256, 256), seed: int = 0, n_subclusters: int = 3):
    """Procedural (seeds, segmentation) pair shaped like real preprocessed data.

    Concentric-ellipsoid anatomy with per-meta-label subcluster seeds in the
    reference's label layout (meta-label m -> labels ``10*m .. 10*m+n-1``,
    ``rand_gmm.py:77``) and a FeTA-like 0..7 segmentation.
    """
    rng = np.random.default_rng(seed)
    grids = np.meshgrid(*[np.linspace(-1, 1, s) for s in shape], indexing="ij")
    # random ellipsoid radii per call for variety
    scales = 0.8 + 0.2 * rng.random(3)
    r = np.sqrt(sum((g / s) ** 2 for g, s in zip(grids, scales)))

    seg = np.zeros(shape, dtype=np.int16)
    radii = [0.95, 0.8, 0.62, 0.45, 0.3, 0.18, 0.08]
    for lab, rad in enumerate(radii, start=1):
        seg[r < rad] = lab

    # meta-label partition: skull/extra (4), CSF (1), GM (2), WM (3)
    meta = np.zeros(shape, dtype=np.int16)
    meta[(seg == 1) | (seg == 4)] = 1
    meta[(seg == 2) | (seg == 6)] = 2
    meta[(seg == 3) | (seg == 5) | (seg == 7)] = 3
    meta[(r >= 0.95) & (r < 1.05)] = 4

    seeds = np.zeros(shape, dtype=np.int16)
    mask = meta > 0
    sub = rng.integers(0, n_subclusters, size=int(mask.sum()))
    seeds[mask] = (10 * meta[mask] + sub).astype(np.int16)
    return seeds, seg


def scanner_ab_case(cube: int = 128, ns_grid: int = 32):
    """Deterministic single-stack scanner geometry for kernel A/B tests.

    Shared by ``tests/test_kernel_parity.py`` (interpreter-mode kernel vs
    jnp fallback) and ``tests_tpu`` (compiled Mosaic vs CPU-pinned probes):
    a production-scale gap (gap_vox = 4, z-extraction lane slope 4) with
    recorded-trajectory motion — the geometry class where a kernel
    window-bound bug corrupts the TPU path while the CPU suite stays green.

    Returns a dict with the phantom (vol, mask), stack geometry and scalars,
    ready to feed ``scanner._acquire_stack`` / ``scanner._recon_stack``.
    """
    from scipy.ndimage import gaussian_filter

    from .generator.artifacts import scanner as sc
    from .generator.artifacts.motion import sample_motion
    from .generator.artifacts.transforms import random_init_stack_transforms

    rng = np.random.default_rng(11)
    shape = (96, 96, 96)
    base = np.zeros(shape, np.float32)
    base[20:76, 24:72, 22:74] = 100.0
    vol = gaussian_filter(
        base + rng.normal(0, 5, shape).astype(np.float32) * (base > 0), 1.0
    ).astype(np.float32)
    mask = (vol > 5).astype(np.float32)

    res, res_s, thick, gap = 0.5, 0.7, 2.0, 2.0
    rs, gap_vox = res_s / res, gap / res
    ns = min(int(max(shape) * res / gap) + 2, ns_grid)
    t_init = random_init_stack_transforms(ns, gap, False, 3.0, rng)
    t_target = sample_motion(np.arange(ns) * 1.0, rng).compose(t_init)
    mats_vox = t_target.matrix(True).copy()
    mats_vox[:, :, 3] /= res
    geo = sc._stack_geometry(
        t_init.matrix(True)[0, :, :3], mats_vox, shape, ns, cube, ns_grid
    )
    z0 = float((cube - 1) / 2.0 - (ns - 1) / 2.0 * gap_vox)
    i_q, i_ang, i_scl, i_dlt = sc.decompose_affine_paeth_host(
        geo["Minv"], -geo["Minv"] @ geo["t_stack"], cube
    )
    return dict(
        shape=shape, vol=vol, mask=mask, res=res, rs=rs, gap_vox=gap_vox,
        thick=thick, ns=ns, z0=z0, geo=geo, mats_vox=mats_vox,
        inv=(i_q, i_ang, i_scl, i_dlt),
        sig=(sc.GAUSSIAN_FWHM * thick / res, sc.SINC_FWHM * rs, sc.SINC_FWHM * rs),
        sig_rec=(sc.GAUSSIAN_FWHM * thick / res, sc.SINC_FWHM * rs),
    )


def run_scanner_ab(case, cube: int = 128, ns_grid: int = 32):
    """Run one acquire+recon on the current backend for :func:`scanner_ab_case`."""
    import jax
    import jax.numpy as jnp

    from .generator.artifacts import scanner as sc

    s = case
    i_q, i_ang, i_scl, i_dlt = s["inv"]
    slices, valid = sc._acquire_stack(
        jnp.asarray(s["vol"]), jnp.asarray(s["mask"]),
        jnp.int32(s["geo"]["fwd"][0]), jnp.asarray(s["geo"]["fwd"][1]),
        jnp.float32(s["geo"]["fwd"][2]), jnp.asarray(s["geo"]["fwd"][3]),
        jnp.asarray(s["geo"]["G"]), jnp.float32(s["rs"]),
        jnp.float32(s["gap_vox"]), jnp.float32(s["z0"]),
        jnp.asarray(s["sig"], jnp.float32), jnp.float32(0.15),
        jnp.int32(s["ns"]), jax.random.PRNGKey(0), jnp.float32(1.0),
        jnp.asarray(False), jnp.float32(0.0), jnp.float32(0.0),
        jnp.float32(0.1), cube=cube, ns_grid=ns_grid,
    )
    v_s, w_s = sc._recon_stack(
        slices, valid, jnp.asarray(s["geo"]["G"]), jnp.float32(s["rs"]),
        jnp.float32(s["gap_vox"]), jnp.float32(s["z0"]),
        jnp.asarray(s["sig_rec"], jnp.float32),
        jnp.int32(i_q), jnp.asarray(i_ang), jnp.float32(i_scl),
        jnp.asarray(i_dlt), cube=cube, ns_grid=ns_grid, out_shape=s["shape"],
    )
    return (
        np.asarray(slices), np.asarray(valid), np.asarray(v_s), np.asarray(w_s)
    )
