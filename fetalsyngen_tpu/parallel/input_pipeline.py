"""High-throughput input pipeline: device-resident seed banks + prefetch.

SURVEY §7 hard-part #5: the reference re-reads 4 seed NIfTIs from disk per
sample inside forked DataLoader workers (``rand_gmm.py:90-97``,
``test_dl.py:17-23``) — host IO can starve a pod. The TPU-native pipeline:

1. **Device seed banks.** All (n_subclusters, meta_label) seed variants of a
   subject are decoded once, stacked into an int8 array
   ``(n_options, 4, D, H, W)``, and cached in HBM. Per-sample seed
   composition (pick a subcluster count per meta-label and SUM the four
   volumes — ``load_seeds``) becomes a jitted device op, so drawing a new
   sample needs zero host IO.
2. **Async prefetch.** Batches are generated one step ahead of consumption
   (``prefetch``), so generation overlaps the consumer (training step).
"""

from __future__ import annotations

import collections
import threading
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..generator.config import GeneratorCfg
from ..generator.pipeline import _synth_core
from ..io import nifti


@partial(jax.jit, static_argnames=())
def compose_seeds(bank: jnp.ndarray, choices: jnp.ndarray) -> jnp.ndarray:
    """Sum per-meta-label seed variants chosen from the bank (device-side
    equivalent of ``ImageFromSeeds.load_seeds``).

    Gather FIRST (int8, 4 volumes), widen after: upcasting the whole bank
    before the gather would read/write n_options x 4 volumes at 4 bytes
    instead of the 4 chosen ones at 1 byte.

    Args:
        bank: (n_options, 4, D, H, W) int8 — all subcluster variants.
        choices: (4,) int32 — variant index per meta-label (0-based).

    Returns:
        (D, H, W) int32 summed seed volume.
    """
    picked = jnp.take_along_axis(bank, choices[:, None, None, None][None], axis=0)[0]
    return picked.astype(jnp.int32).sum(axis=0)


class SeedBankCache:
    """Host->HBM seed bank LRU cache keyed by subject name.

    Eviction is by a BYTE budget, not a subject count: a full bank is
    ``n_options * 4 * D*H*W`` int8 (~400 MB for 6 options at 256^3), and a
    16 GB v5e chip also holds the pipeline buffers — a count-based cap could
    silently eat several GB of HBM.
    """

    def __init__(self, seed_paths: dict, max_bytes: int = 1_200_000_000):
        self.seed_paths = seed_paths
        self.max_bytes = max_bytes
        self._cache: collections.OrderedDict[str, jnp.ndarray] = collections.OrderedDict()
        self._bytes = 0

    @property
    def nbytes(self) -> int:
        return self._bytes

    def options(self, name: str) -> list[int]:
        return sorted(self.seed_paths[name].keys())

    def _load_all(self, name: str) -> np.ndarray:
        """Decode every (option, meta-label) seed volume for one subject.

        The hot path uses the native C++ batch loader (zlib + pthread pool,
        ``io/native``) with RAS reorientation applied host-side; falls back to
        the pure-Python reader when the native library is unavailable.
        """
        from ..io import native

        per_sub = self.seed_paths[name]
        opts = self.options(name)
        paths = [str(per_sub[n][m]) for n in opts for m in range(1, 5)]
        shape = None
        arrs = None
        if native.available():
            probe = nifti.load(paths[0])
            raw = native.load_labels_batch(paths, probe.data.shape)
            if raw is not None:
                arrs = [
                    nifti.to_ras(a, probe.affine)[0].astype(np.int8) for a in raw
                ]
        if arrs is None:
            arrs = [nifti.load_ras(p).data.astype(np.int8) for p in paths]
        n_m = 4
        return np.stack(
            [np.stack(arrs[i * n_m : (i + 1) * n_m]) for i in range(len(opts))]
        )

    def bank(self, name: str) -> jnp.ndarray:
        if name in self._cache:
            self._cache.move_to_end(name)
            return self._cache[name]
        vols = self._load_all(name)
        arr = jnp.asarray(vols)
        self._cache[name] = arr
        self._bytes += vols.nbytes
        while self._bytes > self.max_bytes and len(self._cache) > 1:
            _, evicted = self._cache.popitem(last=False)
            self._bytes -= evicted.size  # int8: 1 byte/elem
        return arr


@partial(jax.jit, static_argnames=("lo", "hi", "B", "cfg"))
def _gen_batch(sub, bank, seg, lo, hi, B, cfg):
    """One fused device program: draw per-sample keys + subcluster choices,
    compose seeds from the bank, run the batched pipeline, scale to [0,1]."""
    keys = jax.random.split(sub, B)
    choices = jax.random.randint(jax.random.fold_in(sub, 1), (B, 4), lo, hi)

    def one(key, ch):
        seeds = compose_seeds(bank, ch)
        out, seg_o, _, _ = _synth_core(
            key, seeds, seg, jnp.zeros((), jnp.float32), (), cfg, (), False
        )
        peak = jnp.max(out)
        out = out / jnp.where(peak > 0, peak, 1.0)
        return out, seg_o

    return jax.vmap(one)(keys, choices)


class SyntheticStream:
    """Iterator of device-generated batches from a ``FetalSynthDataset``.

    Each batch draws one subject (round-robin), composes per-sample seeds on
    device, and runs the jitted batched pipeline. With ``prefetch=True`` the
    next batch is generated while the caller consumes the current one.
    """

    def __init__(self, dataset, batch_size: int = 4, seed: int = 0, prefetch: bool = True):
        self.dataset = dataset
        self.cfg: GeneratorCfg = dataset.generator.cfg
        self.batch_size = batch_size
        self.prefetch = prefetch
        self._rng = np.random.default_rng(seed)
        self._key = jax.random.PRNGKey(seed)
        self._banks = SeedBankCache(dataset.seed_paths)
        self._names = sorted(dataset.seed_paths.keys())
        self._segs = {}
        self._i = 0

    def _seg(self, name: str) -> jnp.ndarray:
        if name not in self._segs:
            idx = [self.dataset._sub_ses_idx(i) for i in range(len(self.dataset.sub_ses))].index(
                name
            )
            self._segs[name] = jnp.asarray(
                nifti.load_ras(str(self.dataset.segm_paths[idx])).data, jnp.int32
            )
        return self._segs[name]

    def _generate(self):
        name = self._names[self._i % len(self._names)]
        self._i += 1
        bank = self._banks.bank(name)
        seg = self._seg(name)
        n_opts = bank.shape[0]
        B = self.batch_size

        self._key, sub = jax.random.split(self._key)
        icfg = self.cfg.intensity
        lo = max(icfg.min_subclusters - 1, 0)
        hi = min(icfg.max_subclusters, n_opts)

        # ONE device call per batch: key split, subcluster choices, seed
        # composition, the batched pipeline, and [0,1] scaling all live in a
        # single jitted program (per-batch host dispatches cost ~ms-level
        # tunnel latency each).
        images, labels = _gen_batch(sub, bank, seg, lo, hi, B, self.cfg)
        return {"image": images, "label": labels, "name": name}

    def __iter__(self):
        if not self.prefetch:
            while True:
                yield self._generate()

        q: collections.deque = collections.deque()
        lock = threading.Lock()

        def producer():
            batch = self._generate()
            with lock:
                q.append(batch)

        t = threading.Thread(target=producer)
        t.start()
        while True:
            t.join()
            with lock:
                batch = q.popleft()
            t = threading.Thread(target=producer)
            t.start()
            yield batch
