"""Motion simulation: slice acquisition + PSF reconstruction, TPU-first.

Reference behavior: ``Scanner.scan`` + ``PSFReconstructor``
(``fetalsyngen/generator/artifacts/simulate_reco.py:57-774``) backed by the
``slice_acq_cuda`` extension (``svort/slice_acquisition/slice_acq_cuda_kernel.cu``):
one GPU thread per slice pixel gathers the volume under a rigidly-transformed
PSF footprint; the adjoint scatters with atomicAdd + weight equalization.

TPU re-design — no scatter/gather at all. Per stack:

  acquisition:  V --rot warp--> stack frame --PSF blur--> --xy scale (matmul)-->
                --per-slice motion passes--> slices (+ gamma/Rician/void)
  reconstruction: slices --inverse motion passes--> stack grid --z PSF blur-->
                --inverse xy scale--> --inverse rot warp--> accumulate (value,
                weight) over stacks --> equalize --> smooth --> merge with GT

Each arrow is a separable matmul or a hat-kernel pass (ops/warp.py), so the
whole engine runs at VPU/MXU rates. The factored acquisition
(rotate-blur-sample) is mathematically the reference's PSF model: sampling a
slice-frame-oriented Gaussian PSF equals sampling the volume rotated into the
slice frame and blurred axis-aligned.

Known deviations (documented): the slice FOV is a static 384-pixel grid (the
reference sizes it dynamically to the volume diagonal); slice validity is
derived from the acquired slices rather than separately-acquired mask slices;
per-slice motion beyond the pass window (~24 voxels in-block span) clamps.
Host draws all scalar randomness (matching the reference's np.random use) and
orchestrates per-stack jitted calls with static shapes.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.linops import (
    apply_axis_matrix,
    gaussian_blur_mm,
    interp_matrix,
    toeplitz_blur_matrix,
)
from ...ops.morphology import box_sum
from ...ops.noise import fractal_noise_3d, mog_3d
from ...ops.warp import hat_pass, warp_rigid_separable
from .psf import GAUSSIAN_FWHM, SINC_FWHM
from .quality import ReconMergeParams, masked_random_centers
from .transforms import (
    RigidTransform,
    interleave_index,
    random_angle,
    random_init_stack_transforms,
    reset_transform,
)
from .motion import sample_motion

# Static grid sizes (multiples of 128 for the Pallas passes).
SS = 384  # slice grid (pixels)
ZS = 384  # stack-frame z extent (voxels)
NS = 128  # max slices per stack

_FLIP = np.array([[0, 0, 1], [0, 1, 0], [1, 0, 0]], dtype=np.float32)


@dataclass
class ScannerParams:
    """Schema parity with reference ``artifacts/utils.py:10-38``."""

    resolution_slice_fac_min: float
    resolution_slice_fac_max: float
    resolution_slice_max: float
    slice_thickness_min: float
    slice_thickness_max: float
    gap_min: float
    gap_max: float
    min_num_stack: int
    max_num_stack: int
    max_num_slices: int
    noise_sigma_min: float
    noise_sigma_max: float
    TR_min: float
    TR_max: float
    prob_void: float
    prob_gamma: float
    gamma_std: float
    slice_size: int | None = None
    restrict_transform: bool = False
    txy: float = 3.0
    resolution_recon: float | None = None
    slice_noise_threshold: float = 0.1


@dataclass
class ReconParams:
    """Schema parity with reference ``artifacts/utils.py:67-78``."""

    prob_misreg_slice: float
    slices_misreg_ratio: float
    prob_misreg_stack: float
    txy: float
    prob_smooth: float
    prob_rm_slices: float
    rm_slices_min: float
    rm_slices_max: float
    prob_merge: float
    merge_params: ReconMergeParams


# ---------------------------------------------------------------------------
# jitted per-stack device stages
# ---------------------------------------------------------------------------

@jax.jit
def _blur_scale(W, sigmas, scale_m):
    """PSF blur in the stack frame, then scale xy to slice-pixel spacing."""
    W = gaussian_blur_mm(W, sigmas, 8)
    W = apply_axis_matrix(W, scale_m, 1)
    W = apply_axis_matrix(W, scale_m, 2)
    return W


@jax.jit
def _extract_slices(Wv, z_coefs, dz, dv, du):
    """Sample NS slices from the stack volume with per-slice motion offsets.

    z positions: affine in the slice index (gap spacing) + per-element motion
    dz; in-plane: identity + motion (dv, du).
    """
    # pass 1: resample stack-z -> slice index (lanes = z of Wv after transpose)
    x = jnp.transpose(Wv, (1, 2, 0))  # (v, u, z)
    x = hat_pass(x, z_coefs, jnp.transpose(dz, (1, 2, 0)), (SS, SS, ZS), 48, False, out_len=NS)
    x = jnp.transpose(x, (2, 0, 1))  # (n, v, u)
    # pass 2: in-plane v
    x = jnp.transpose(x, (0, 2, 1))  # (n, u, v)
    x = hat_pass(x, (0.0, 0.0, 1.0, 0.0), jnp.transpose(dv, (0, 2, 1)), (NS, SS, SS), 48, False)
    x = jnp.transpose(x, (0, 2, 1))  # (n, v, u)
    # pass 3: in-plane u
    x = hat_pass(x, (0.0, 0.0, 1.0, 0.0), du, (NS, SS, SS), 48, False)
    return x


@jax.jit
def _slice_artifacts(key, slices, gamma, gamma_on, sigma, void_prob, threshold):
    """Per-slice gamma, Rician noise, and signal voids
    (reference ``simulate_reco.py:210-298``)."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    # gamma (simulate_reco.py:210-234)
    g = 300.0 * jnp.power(jnp.maximum(slices, 0.0) / 300.0, gamma)
    g = g / jnp.maximum(jnp.max(g), 1e-6)
    slices = jnp.where(gamma_on, g, slices)
    # Rician noise over voxels above threshold (simulate_reco.py:236-256)
    n1 = jax.random.normal(k1, slices.shape) * sigma
    n2 = jax.random.normal(k2, slices.shape) * sigma
    noisy = jnp.sqrt((slices + n1) ** 2 + n2**2)
    slices = jnp.where(slices > threshold, noisy, slices)
    # signal voids (simulate_reco.py:258-298)
    n = slices.shape[0]
    on = jax.random.uniform(k3, (n, 1, 1)) < void_prob
    h = w = SS
    y = jnp.linspace(-(h - 1) / 2, (h - 1) / 2, h)[None, :, None]
    x = jnp.linspace(-(w - 1) / 2, (w - 1) / 2, w)[None, None, :]
    ku = jax.random.uniform(k4, (6, n, 1, 1))
    yc = (ku[0] - 0.5) * (h - 1)
    xc = (ku[1] - 0.5) * (w - 1)
    theta = 2 * jnp.pi * ku[2]
    xv = jnp.cos(theta) * (x - xc) - jnp.sin(theta) * (y - yc)
    yv = jnp.sin(theta) * (x - xc) + jnp.cos(theta) * (y - yc)
    a = 30 + ku[3] * 90
    A = ku[4] * 0.5 + 0.5
    sx = ku[5] * 30 + 39
    sy = a**2 / sx
    mask = 1 - A * jnp.exp(-0.5 / sx**2 * xv**2 - 0.5 / sy**2 * yv**2)
    return jnp.where(on, slices * mask, slices)


@jax.jit
def _recon_place(slices, slice_valid, n_coefs, dzi, dvi, dui, inv_scale_m, sigz_mats):
    """Place slices back on the stack-frame grid; returns (value, weight)."""

    def chain(x):
        # inverse motion passes: stack grid samples the slice stack
        y = jnp.transpose(x, (1, 2, 0))  # (v, u, n)
        y = hat_pass(y, n_coefs, jnp.transpose(dzi, (1, 2, 0)), (SS, SS, NS), 48, False, out_len=ZS)
        y = jnp.transpose(y, (2, 0, 1))  # (z, v, u)
        y = jnp.transpose(y, (0, 2, 1))
        y = hat_pass(y, (0.0, 0.0, 1.0, 0.0), jnp.transpose(dvi, (0, 2, 1)), (ZS, SS, SS), 48, False)
        y = jnp.transpose(y, (0, 2, 1))
        y = hat_pass(y, (0.0, 0.0, 1.0, 0.0), dui, (ZS, SS, SS), 48, False)
        # recon PSF spread along z
        y = apply_axis_matrix(y, sigz_mats, 0)
        # inverse xy scale back to voxel spacing
        y = apply_axis_matrix(y, inv_scale_m, 1)
        y = apply_axis_matrix(y, inv_scale_m, 2)
        return y

    masked = slices * slice_valid[:, None, None]
    wvol = chain(jnp.broadcast_to(slice_valid[:, None, None], slices.shape).astype(jnp.float32))
    vvol = chain(masked)
    return vvol, wvol


@jax.jit
def _finalize(value, weight, volume_gt, seg_gt, key, smooth_on, merge_on, merge_weight):
    """Equalize, optional box smooth, merge with GT
    (``simulate_reco.py:584-709``)."""
    ok = weight > 1e-2
    recon = jnp.where(ok, value / jnp.where(ok, weight, 1.0), 0.0)
    smoothed = box_sum(recon, 3) / 27.0
    recon = jnp.where(smooth_on, smoothed, recon)
    merged = jnp.where(merge_on, merge_weight * recon + (1 - merge_weight) * volume_gt, recon)
    return merged


# ---------------------------------------------------------------------------
# Host orchestration
# ---------------------------------------------------------------------------

def _axis_affine(R_xyz: np.ndarray, t_xyz: np.ndarray, in_center, out_center):
    """xyz-space rigid (x fastest) -> axis-space affine mapping output grid
    indices to input grid indices: p_in = M q_out + t."""
    M = _FLIP @ R_xyz @ _FLIP
    t = np.asarray(in_center) - M @ np.asarray(out_center) + _FLIP @ t_xyz
    return M.astype(np.float32), t.astype(np.float32)


class SimulateMotion:
    """Reference-parity motion artifact (``artifacts.py:345-425``)."""

    def __init__(self, prob: float, scanner_params: ScannerParams, recon_params: ReconParams):
        self.prob = prob
        self.scanner_args = scanner_params
        self.recon_args = recon_params

    def __call__(self, output, seg, genparams=None, resolution=(0.5, 0.5, 0.5), rng=None, key=None, **kw):
        genparams = genparams or {}
        rng = rng or np.random.default_rng()
        if rng.random() >= self.prob and not genparams:
            return output, {}
        key = key if key is not None else jax.random.PRNGKey(int(rng.integers(2**31)))

        sp = self.scanner_args
        rp = self.recon_args
        res = float(resolution[0])
        vol = jnp.asarray(output, jnp.float32)
        shape = vol.shape

        # --- resolutions (simulate_reco.py:142-191; res_recon = res here,
        # matching SimulateMotion.__call__ which pins resolution_recon = res)
        res_s = float(
            genparams.get("resolution_slice")
            or rng.uniform(
                max(sp.resolution_slice_fac_min * res, res),  # clamp: slices >= volume res
                min(sp.resolution_slice_fac_max * res, sp.resolution_slice_max),
            )
        )
        s_thick = float(genparams.get("slice_thickness") or rng.uniform(sp.slice_thickness_min, sp.slice_thickness_max))
        gap = float(genparams.get("gap") or rng.uniform(sp.gap_min, sp.gap_max))
        rs = res_s / res
        gap_vox = gap / res

        num_stacks = int(rng.integers(sp.min_num_stack, sp.max_num_stack + 1))
        ns = min(int(max(shape) * res / gap) + 2, NS)

        # PSF sigmas in stack-frame voxel units (acquisition PSF,
        # simulate_reco.py:338): (z, y, x) = (thick, res_s, res_s)/res
        sig = jnp.asarray(
            [GAUSSIAN_FWHM * s_thick / res, SINC_FWHM * rs, SINC_FWHM * rs], jnp.float32
        )
        # xy scale matrices: slice-pixel grid at rs spacing (centered)
        c_ss = (SS - 1) / 2.0
        coords = jnp.asarray((np.arange(SS) - c_ss) * rs + c_ss, jnp.float32)
        scale_m = interp_matrix(coords, SS)
        inv_coords = jnp.asarray((np.arange(SS) - c_ss) / rs + c_ss, jnp.float32)
        inv_scale_m = interp_matrix(inv_coords, SS)
        # recon z-PSF spread (sigma_z at res_r = res)
        sigz_m = toeplitz_blur_matrix(jnp.float32(GAUSSIAN_FWHM * s_thick / res), ZS, 8)

        c_vol = (np.asarray(shape) - 1) / 2.0
        c_stack = np.array([(ZS - 1) / 2.0, (SS - 1) / 2.0, (SS - 1) / 2.0])

        value_acc = jnp.zeros(shape, jnp.float32)
        weight_acc = jnp.zeros(shape, jnp.float32)
        total_slices = 0
        misreg_stack_on = []

        for s_i in range(num_stacks):
            skey = jax.random.fold_in(key, 100 + s_i)
            # --- stack transforms (host)
            t_init = random_init_stack_transforms(ns, gap_vox * res, sp.restrict_transform, sp.txy, rng)
            ts = np.arange(ns) * rng.uniform(sp.TR_min, sp.TR_max)
            t_motion = sample_motion(ts, rng)
            ilv = interleave_index(ns, int(rng.integers(2, int(np.sqrt(ns)) + 1)))
            t_motion = t_motion[np.asarray(ilv)]
            t_target = t_motion.compose(t_init)
            mats = t_target.matrix(True)  # (ns, 3, 4), translations in mm
            mats_vox = mats.copy()
            mats_vox[:, :, 3] /= res  # mm -> voxel units

            # stack base = rotation of the init transform
            Rb = t_init.matrix(True)[0, :, :3]
            M = _FLIP @ Rb @ _FLIP  # axis-space rotation
            t = c_vol - M @ c_stack

            Wv = warp_rigid_separable(vol, M, np.zeros(3), out_shape=(ZS, SS, SS))
            Wv = _blur_scale(Wv, sig, scale_m)

            # --- per-slice maps: slice n pixel (v, u) -> stack-frame coords.
            # q_n = A_w^{-1} (R_n (p + t_n)) with A_w the stack-frame map.
            Minv_np = np.linalg.inv(M)
            G = np.zeros((NS, 3, 4), np.float32)  # axis-space affine per slice
            for n in range(NS):
                nn = min(n, ns - 1)
                Rn = mats_vox[nn, :, :3]
                tn = mats_vox[nn, :, 3]
                Ma, ta = _axis_affine(Rn, Rn @ tn, c_vol, np.zeros(3))
                # compose with inverse stack map: q = Minv (p - t)
                G[n, :, :3] = Minv_np @ Ma
                G[n, :, 3] = Minv_np @ (ta - t)
            # base (no-motion) map: z = cz + (n - (ns-1)/2) * gap_vox;
            # in-plane: u,v scaled grid == identity in slice-pixel space
            z0 = c_stack[0] - (ns - 1) / 2.0 * gap_vox
            nidx = np.arange(NS, dtype=np.float32)
            vv = (np.arange(SS, dtype=np.float32) - c_ss)
            # slice-pixel xyz in slice frame (u,v at rs spacing, z=0)
            # per-slice deviation fields (NS, SS, SS), axis order (n, v, u)
            un = vv[None, None, :] * rs  # slice-local xyz in VOXEL units
            vn = vv[None, :, None] * rs
            base_z = z0 + nidx[:, None, None] * gap_vox
            # G maps slice-LOCAL xyz (axis order z,v,u with z==0 plane):
            # q_axis = G[:, :3] @ (0, vn, un)_axis? p_uv axis = (0, v*rs, u*rs)
            p0 = np.zeros((NS, 1, 1), np.float32)
            qz = (
                G[:, 0, 1][:, None, None] * vn
                + G[:, 0, 2][:, None, None] * un
                + G[:, 0, 3][:, None, None]
                + p0
            )
            qv = (
                G[:, 1, 1][:, None, None] * vn
                + G[:, 1, 2][:, None, None] * un
                + G[:, 1, 3][:, None, None]
                + p0
            )
            qu = (
                G[:, 2, 1][:, None, None] * vn
                + G[:, 2, 2][:, None, None] * un
                + G[:, 2, 3][:, None, None]
                + p0
            )
            # deviations: z in voxel units; in-plane converted to the SCALED
            # grid (xy spacing rs): grid coord = c + (q_vox - c)/rs, identity
            # base = c + pixel offset.
            dz = jnp.asarray(qz - base_z, jnp.float32)
            dv = jnp.asarray((qv - c_stack[1]) / rs - vv[None, :, None], jnp.float32)
            du = jnp.asarray((qu - c_stack[2]) / rs - vv[None, None, :], jnp.float32)
            z_coefs = (0.0, 0.0, float(gap_vox), float(z0))

            slices = _extract_slices(Wv, z_coefs, dz, dv, du)

            # --- slice validity (reference drops near-empty slices,
            # simulate_reco.py:408-420) — derived from acquired energy here.
            nnz = np.array(jnp.sum(jnp.abs(slices) > 0.05 * jnp.max(slices), (1, 2)))
            nnz[ns:] = 0
            thr = nnz.max() * rng.uniform(0.1, 0.3)
            valid = nnz > thr
            if valid.any():
                nzidx = np.nonzero(valid)[0]
                valid[nzidx[0] : nzidx[-1]] = True
            valid_f = jnp.asarray(valid.astype(np.float32))

            # --- per-slice artifacts
            gamma_on = rng.random() < sp.prob_gamma
            gamma = float(np.exp(sp.gamma_std * rng.standard_normal()))
            sigma = rng.uniform(sp.noise_sigma_min, sp.noise_sigma_max)
            slices = _slice_artifacts(
                jax.random.fold_in(skey, 1),
                slices,
                jnp.float32(gamma),
                jnp.asarray(gamma_on),
                jnp.float32(sigma),
                jnp.float32(sp.prob_void),
                jnp.float32(sp.slice_noise_threshold),
            )

            # --- reconstruction transforms (misregistration; reference
            # simulate_reco.py:597-647). GT transforms with optional per-stack
            # offset and a single swapped slice.
            mats_rec = mats_vox.copy()
            misreg_stack = rng.random() < rp.prob_misreg_stack
            misreg_stack_on.append(bool(misreg_stack))
            if misreg_stack:
                off = RigidTransform(
                    np.concatenate(
                        [
                            np.broadcast_to(random_angle(1, True, rng), (ns, 3)),
                            np.stack(
                                [
                                    np.full(ns, rng.uniform(-rp.txy, rp.txy), np.float32),
                                    np.full(ns, rng.uniform(-rp.txy, rp.txy), np.float32),
                                    np.zeros(ns, np.float32),
                                ],
                                -1,
                            ),
                        ],
                        -1,
                    ).astype(np.float32)
                )
                mats_rec[:ns] = off.compose(RigidTransform(mats_rec[:ns])).matrix(True)
            if rng.random() < rp.prob_misreg_slice and ns > 0:
                # swap one slice's transform with its init (reference keeps
                # idx_misreg[:1], simulate_reco.py:644)
                j = int(rng.integers(ns))
                mats_rec[j] = reset_transform(t_init)[min(j, ns - 1)].matrix(True)[0]
                mats_rec[j, :, 3] /= res

            # removed slices (simulate_reco.py:711-728)
            keep = valid.copy()
            if rng.random() < rp.prob_rm_slices:
                ratio = rng.uniform(rp.rm_slices_min, rp.rm_slices_max)
                drop = rng.permutation(NS)[: int(NS * ratio)]
                keep[drop] = False

            # inverse per-slice maps for recon placement: stack-grid -> slice idx
            Grec = np.zeros((NS, 3, 4), np.float32)
            for n in range(NS):
                nn = min(n, ns - 1)
                Rn = mats_rec[nn, :, :3]
                tn = mats_rec[nn, :, 3]
                Ma, ta = _axis_affine(Rn, Rn @ tn, c_vol, np.zeros(3))
                Grec[n, :, :3] = Minv_np @ Ma
                Grec[n, :, 3] = Minv_np @ (ta - t)
            def slice_fields(Gm):
                q = [
                    Gm[:, a, 1][:, None, None] * vn
                    + Gm[:, a, 2][:, None, None] * un
                    + Gm[:, a, 3][:, None, None]
                    + p0
                    for a in range(3)
                ]
                return q

            qz_r, qv_r, qu_r = slice_fields(Grec)
            # first-order inverse deviations, defined per slice then
            # resampled onto the stack z-grid at n(z) = (z - z0)/gap
            dzi_n = jnp.asarray(-(qz_r - base_z) / gap_vox, jnp.float32)
            dvi_n = jnp.asarray(-((qv_r - c_stack[1]) / rs - vv[None, :, None]), jnp.float32)
            dui_n = jnp.asarray(-((qu_r - c_stack[2]) / rs - vv[None, None, :]), jnp.float32)
            n_of_z = jnp.asarray((np.arange(ZS) - z0) / gap_vox, jnp.float32)
            Mn2z = interp_matrix(n_of_z, NS)  # (ZS, NS)
            dzi = apply_axis_matrix(dzi_n, Mn2z, 0)
            dvi = apply_axis_matrix(dvi_n, Mn2z, 0)
            dui = apply_axis_matrix(dui_n, Mn2z, 0)
            n_coefs = (0.0, 0.0, float(1.0 / gap_vox), float(-z0 / gap_vox))

            v_stack, w_stack = _recon_place(
                slices,
                valid_f * jnp.asarray(keep.astype(np.float32)),
                n_coefs,
                dzi,
                dvi,
                dui,
                inv_scale_m,
                sigz_m,
            )
            v_s = warp_rigid_separable(v_stack, Minv_np, np.zeros(3), out_shape=tuple(shape))
            w_s = warp_rigid_separable(w_stack, Minv_np, np.zeros(3), out_shape=tuple(shape))
            value_acc = value_acc + v_s
            weight_acc = weight_acc + w_s
            total_slices += int(valid.sum())
            if total_slices >= sp.max_num_slices:
                break

        # --- finalize: equalize, smooth, merge (PSFReconstructor seeds)
        smooth_on = rng.random() < rp.prob_smooth
        merge_on = rng.random() < rp.prob_merge
        mp = rp.merge_params
        meta = {
            "resolution_recon": res,
            "resolution_slice": res_s,
            "slice_thickness": s_thick,
            "gap": gap,
            "nstacks": num_stacks,
            "smooth_volume_on": smooth_on,
            "merge_volume_on": merge_on,
            "misreg_stack_on": misreg_stack_on,
        }
        if mp.merge_type == "perlin":
            res_p = int(rng.choice(mp.perlin_res_list))
            octave = int(rng.choice(mp.perlin_octaves_list))
            mw = fractal_noise_3d(
                jax.random.fold_in(key, 7),
                shape,
                (res_p, res_p, res_p),
                octaves=octave,
                persistence=mp.perlin_persistence,
                lacunarity=mp.perlin_lacunarity,
                increase=mp.perlin_increase_size,
            )
            meta.update({"merge_type": "perlin", "res": res_p, "octave": octave})
        else:
            ng = int(rng.integers(mp.gauss_ngaussians_min, mp.gauss_ngaussians_max))
            centers, cvalid = masked_random_centers(
                jax.random.fold_in(key, 8), (jnp.asarray(seg) > 0).astype(jnp.int32), 8, ng
            )
            sigmas = np.clip(20 + 10 * rng.standard_normal((8, 1)), 5, 40)
            mw = mog_3d(shape, centers, jnp.asarray(sigmas, jnp.float32), cvalid)
            meta.update({"merge_type": "gaussian", "ngaussians_merge": ng})

        out = _finalize(
            value_acc,
            weight_acc,
            vol,
            jnp.asarray(seg),
            key,
            jnp.asarray(smooth_on),
            jnp.asarray(merge_on),
            mw,
        )
        return out, meta
