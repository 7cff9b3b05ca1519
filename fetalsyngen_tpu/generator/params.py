"""Per-sample generation parameters: the replay contract.

The reference threads a ``genparams`` dict through every stage; a value present
in the dict overrides the random draw and forces the stage's probability gate
on (reference ``model.py:99-113``, ``synthseg.py:63``, ``affine_nonrigid.py:140``,
docs "Fixed Image Generation"). Here that contract becomes an explicit, dense
``GenParams`` pytree sampled inside jit from a single ``jax.random`` key, with
Python-level overrides (the *set* of overridden keys is static, so the common
no-override path compiles exactly once and ``vmap``s over the batch).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from .config import GeneratorCfg

# Stable fold_in tags for parameter draws (scalars) and voxel fields.
_TAGS = {
    "mus": 1,
    "sigmas": 2,
    "class_perturb": 3,
    "deform_apply": 10,
    "flip": 11,
    "rotations": 12,
    "shears": 13,
    "scalings": 14,
    "nonlin_scale": 15,
    "nonlin_std": 16,
    "gamma_apply": 20,
    "gamma": 21,
    "bf_apply": 30,
    "bf_scale": 31,
    "bf_std": 32,
    "resample_apply": 40,
    "spacing": 41,
    "blur_mult": 42,
    "noise_apply": 50,
    "noise_std": 51,
    # voxel-field keys (used by the pipeline, reserved here)
    "field_intensity": 100,
    "field_nonlin": 101,
    "field_bias": 102,
    "field_noise": 103,
    "shift": 104,
}


def field_key(key: jax.Array, name: str) -> jax.Array:
    """Derive the PRNG key for a named voxel field."""
    return jax.random.fold_in(key, _TAGS[name])


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GenParams:
    """Dense per-sample generation parameters (all leaves are jnp arrays).

    Mirrors the reference's nested genparams dict flattened to fixed-shape
    leaves so a batch of samples is just a stacked ``GenParams``. A plain
    frozen dataclass registered as a jax pytree (every field is a data
    leaf) — the core package must import without flax, which is only an
    optional ``train`` extra.
    """

    # seed_intensities (rand_gmm.py:120-145)
    mus: jnp.ndarray  # (nlabels,)
    sigmas: jnp.ndarray  # (nlabels,)
    # deform_params (affine_nonrigid.py:140-151, 239-325)
    deform_apply: jnp.ndarray  # () bool
    flip: jnp.ndarray  # () bool
    rotations: jnp.ndarray  # (3,) radians
    shears: jnp.ndarray  # (3,)
    scalings: jnp.ndarray  # (3,)
    nonlin_scale: jnp.ndarray  # ()
    nonlin_std: jnp.ndarray  # ()
    size_F_small: jnp.ndarray  # (3,) int32
    # gamma_params (synthseg.py:263-268)
    gamma_apply: jnp.ndarray  # () bool
    gamma: jnp.ndarray  # ()
    # bf_params (synthseg.py:157-170)
    bf_apply: jnp.ndarray  # () bool
    bf_scale: jnp.ndarray  # ()
    bf_std: jnp.ndarray  # ()
    bf_size: jnp.ndarray  # (3,) int32
    # resample_params (synthseg.py:63-80)
    resample_apply: jnp.ndarray  # () bool
    spacing: jnp.ndarray  # (3,)
    new_size: jnp.ndarray  # (3,) int32 downsample grid (synthseg.py:84)
    blur_mult: jnp.ndarray  # () the (0.85 + 0.3 U) blur factor
    # noise_params (synthseg.py:218-223)
    noise_apply: jnp.ndarray  # () bool
    noise_std: jnp.ndarray  # ()


def _uniform(key: jax.Array, name: str, shape=(), lo=0.0, hi=1.0) -> jnp.ndarray:
    return jax.random.uniform(
        jax.random.fold_in(key, _TAGS[name]), shape, jnp.float32, lo, hi
    )


def _bernoulli(key: jax.Array, name: str, p: float) -> jnp.ndarray:
    return _uniform(key, name) < p


def resolve_new_size_override(ov: dict, cfg: GeneratorCfg) -> dict:
    """Derive the ``new_size`` override from a CONCRETE ``spacing`` override.

    The reference truncates the f64 quotient on host
    (``synthseg.py:84``: ``(shape * res / spacing).astype(int)``); a host
    genparams spacing must keep its full precision for this step — f64(1.2)
    and f32(1.2) sit on opposite sides of the ``24 / 1.2`` truncation
    boundary. Traced spacings (inside jit) fall through to the in-trace
    exact-f32 law in :func:`sample_params`.
    """
    if "spacing" in ov and "new_size" not in ov and not isinstance(ov["spacing"], jax.core.Tracer):
        import numpy as np

        ov = dict(ov)
        ov["new_size"] = (
            np.asarray(cfg.shape)
            * np.asarray(cfg.resolution, np.float64)
            / np.asarray(ov["spacing"], np.float64)
        ).astype(np.int32)
    return ov


def sample_params(key: jax.Array, cfg: GeneratorCfg, overrides: dict[str, Any] | None = None) -> GenParams:
    """Sample a full ``GenParams`` from ``key``; ``overrides`` pin values.

    Override keys use the flat field names of :class:`GenParams`. A provided
    value forces the corresponding probability gate on unless the gate flag
    itself is also overridden — mirroring the reference contract.
    Traceable (jit/vmap-safe): the override key-set is Python-static.
    """
    ov = resolve_new_size_override(dict(overrides or {}), cfg)

    def get(name, sampler):
        if name in ov:
            return jnp.asarray(ov[name])
        return sampler()

    def gate(name, p, dependents):
        if name in ov:
            return jnp.asarray(ov[name])
        if any(d in ov for d in dependents):
            return jnp.asarray(True)
        return _bernoulli(key, name, p)

    icfg = cfg.intensity
    nlabels = icfg.nlabels
    mus = get("mus", lambda: 25.0 + 200.0 * _uniform(key, "mus", (nlabels,)))
    sigmas = get("sigmas", lambda: 5.0 + 20.0 * _uniform(key, "sigmas", (nlabels,)))
    # class-tied perturbation (rand_gmm.py:139-145): labels sharing a
    # generation class share a mean up to +-25 noise.
    if "mus" not in ov and tuple(icfg.generation_classes) != tuple(icfg.seed_labels):
        seed_labels = jnp.asarray(icfg.seed_labels, dtype=jnp.int32)
        gen_classes = jnp.asarray(icfg.generation_classes, dtype=jnp.int32)
        perturb = 25.0 * jax.random.normal(
            jax.random.fold_in(key, _TAGS["class_perturb"]), (len(icfg.seed_labels),)
        )
        mus = mus.at[seed_labels].set(jnp.clip(mus[gen_classes] + perturb, 0.0, 225.0))

    dcfg = cfg.deform
    deform_apply = gate(
        "deform_apply",
        dcfg.prob,
        ("rotations", "shears", "scalings", "nonlin_scale", "nonlin_std", "size_F_small", "flip"),
    )
    flip = get("flip", lambda: _bernoulli(key, "flip", dcfg.flip_prb))
    mr = dcfg.max_rotation
    rotations = get(
        "rotations",
        lambda: (_uniform(key, "rotations", (3,), -mr, mr)) / 180.0 * jnp.pi,
    )
    shears = get("shears", lambda: _uniform(key, "shears", (3,), -dcfg.max_shear, dcfg.max_shear))
    scalings = get(
        "scalings",
        lambda: 1.0 + _uniform(key, "scalings", (3,), -dcfg.max_scaling, dcfg.max_scaling),
    )
    nonlin_scale = get(
        "nonlin_scale",
        lambda: _uniform(key, "nonlin_scale", (), dcfg.nonlin_scale_min, dcfg.nonlin_scale_max),
    )
    size_F_small = get(
        "size_F_small",
        lambda: jnp.round(nonlin_scale * jnp.asarray(cfg.shape, jnp.float32)).astype(jnp.int32),
    )
    nonlin_std = get("nonlin_std", lambda: dcfg.nonlin_std_max * _uniform(key, "nonlin_std"))

    gcfg = cfg.gamma
    gamma_apply = gate("gamma_apply", gcfg.prob, ("gamma",))
    gamma = get(
        "gamma",
        lambda: jnp.exp(
            gcfg.gamma_std * jax.random.normal(jax.random.fold_in(key, _TAGS["gamma"]))
        ),
    )

    bcfg = cfg.bias_field
    bf_apply = gate("bf_apply", bcfg.prob, ("bf_scale", "bf_std", "bf_size"))
    bf_scale = get("bf_scale", lambda: _uniform(key, "bf_scale", (), bcfg.scale_min, bcfg.scale_max))
    bf_size = get(
        "bf_size",
        lambda: jnp.maximum(
            jnp.round(bf_scale * jnp.asarray(cfg.shape, jnp.float32)).astype(jnp.int32), 1
        ),
    )
    bf_std = get("bf_std", lambda: _uniform(key, "bf_std", (), bcfg.std_min, bcfg.std_max))

    rcfg = cfg.resample
    resample_apply = gate("resample_apply", rcfg.prob, ("spacing",))
    spacing = get(
        "spacing",
        lambda: jnp.ones(3, jnp.float32)
        * _uniform(key, "spacing", (), rcfg.min_resolution, rcfg.max_resolution),
    )
    blur_mult = get("blur_mult", lambda: 0.85 + 0.3 * _uniform(key, "blur_mult"))
    # downsample grid size: trunc(shape * res / spacing) (synthseg.py:84).
    # The reference computes this in f64 on host; for in-trace draws
    # floor_div_exact reproduces the f64-on-these-inputs law in f32 (plain
    # f32 division can round ACROSS an integer boundary: 22/1.1f == 20.0).
    # When spacing comes from a host genparams dict, synth_sample pre-computes
    # the override from the full-precision host value, because f64(1.2) and
    # f32(1.2) sit on opposite sides of a truncation boundary.
    from ..ops.numerics import floor_div_exact

    new_size = get(
        "new_size",
        lambda: floor_div_exact(
            jnp.asarray(cfg.shape, jnp.float32) * jnp.asarray(cfg.resolution, jnp.float32),
            spacing,
        ),
    )

    ncfg = cfg.noise
    noise_apply = gate("noise_apply", ncfg.prob, ("noise_std",))
    noise_std = get("noise_std", lambda: _uniform(key, "noise_std", (), ncfg.std_min, ncfg.std_max))

    return GenParams(
        mus=mus,
        sigmas=sigmas,
        deform_apply=deform_apply,
        flip=flip,
        rotations=rotations,
        shears=shears,
        scalings=scalings,
        nonlin_scale=jnp.asarray(nonlin_scale, jnp.float32).reshape(()),
        nonlin_std=jnp.asarray(nonlin_std, jnp.float32).reshape(()),
        size_F_small=jnp.asarray(size_F_small, jnp.int32),
        gamma_apply=gamma_apply,
        gamma=jnp.asarray(gamma, jnp.float32).reshape(()),
        bf_apply=bf_apply,
        bf_scale=jnp.asarray(bf_scale, jnp.float32).reshape(()),
        bf_std=jnp.asarray(bf_std, jnp.float32).reshape(()),
        bf_size=jnp.asarray(bf_size, jnp.int32),
        resample_apply=resample_apply,
        spacing=jnp.asarray(spacing, jnp.float32),
        new_size=jnp.asarray(new_size, jnp.int32),
        blur_mult=jnp.asarray(blur_mult, jnp.float32).reshape(()),
        noise_apply=noise_apply,
        noise_std=jnp.asarray(noise_std, jnp.float32).reshape(()),
    )


# ---------------------------------------------------------------------------
# Reference-style nested dict <-> flat override conversion
# ---------------------------------------------------------------------------

def overrides_from_genparams(genparams: dict) -> dict[str, Any]:
    """Convert a reference-style nested genparams dict to flat overrides.

    Accepts the structure returned by :meth:`FetalSynthGen.sample`
    (and by the reference's own ``sample``): ``seed_intensities``,
    ``deform_params`` (with ``affine``/``non_rigid``/``flip``),
    ``gamma_params``, ``bf_params``, ``resample_params``, ``noise_params``.
    ``None`` values are dropped, matching ``_validated_genparams``
    (reference ``model.py:85-92``).
    """
    ov: dict[str, Any] = {}
    if not genparams:
        return ov

    def put(name, value):
        if value is not None:
            ov[name] = value

    si = genparams.get("seed_intensities") or {}
    put("mus", si.get("mus"))
    put("sigmas", si.get("sigmas"))

    dp = genparams.get("deform_params") or {}
    if dp:
        affine = dp.get("affine") or {}
        put("rotations", affine.get("rotations"))
        put("shears", affine.get("shears"))
        put("scalings", affine.get("scalings"))
        nr = dp.get("non_rigid") or {}
        put("nonlin_scale", nr.get("nonlin_scale"))
        put("nonlin_std", nr.get("nonlin_std"))
        put("size_F_small", nr.get("size_F_small"))
        put("flip", dp.get("flip"))
        if "deform_apply" in dp:
            put("deform_apply", dp["deform_apply"])

    gp = genparams.get("gamma_params") or {}
    put("gamma", gp.get("gamma"))
    bp = genparams.get("bf_params") or {}
    put("bf_scale", bp.get("bf_scale"))
    put("bf_std", bp.get("bf_std"))
    put("bf_size", bp.get("bf_size"))
    rp = genparams.get("resample_params") or {}
    put("spacing", rp.get("spacing"))
    put("blur_mult", rp.get("blur_mult"))
    np_ = genparams.get("noise_params") or {}
    put("noise_std", np_.get("noise_std"))
    return ov


def genparams_to_dict(p: GenParams) -> dict:
    """Convert ``GenParams`` to the reference-style nested dict (host values)."""
    import numpy as np

    def h(x):
        return np.asarray(x)

    return {
        "seed_intensities": {"mus": h(p.mus), "sigmas": h(p.sigmas)},
        "deform_params": {
            "deform_apply": bool(h(p.deform_apply)),
            "flip": bool(h(p.flip)),
            "affine": {
                "rotations": h(p.rotations),
                "shears": h(p.shears),
                "scalings": h(p.scalings),
            },
            "non_rigid": {
                "nonlin_scale": float(h(p.nonlin_scale)),
                "nonlin_std": float(h(p.nonlin_std)),
                "size_F_small": h(p.size_F_small).tolist(),
            },
        },
        "gamma_params": {"gamma": float(h(p.gamma)) if h(p.gamma_apply) else None},
        "bf_params": (
            {
                "bf_scale": float(h(p.bf_scale)),
                "bf_std": float(h(p.bf_std)),
                "bf_size": h(p.bf_size).tolist(),
            }
            if h(p.bf_apply)
            else {"bf_scale": None, "bf_std": None, "bf_size": None}
        ),
        "resample_params": {
            "spacing": h(p.spacing).tolist() if h(p.resample_apply) else None,
            "blur_mult": float(h(p.blur_mult)),
        },
        "noise_params": {"noise_std": float(h(p.noise_std)) if h(p.noise_apply) else None},
    }
