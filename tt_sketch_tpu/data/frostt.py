"""FROSTT real-world sparse tensor loader (rebuild of scripts/frostt.py,
which targets the pre-v1 reference API and no longer runs there).

Registry of the four FROSTT tensors the reference experiments use
(reference scripts/frostt.py:20-48), a ``.tns(.gz)`` parser (1-based
indices, vectorized instead of the reference's per-line Python loop), npz
caching, and the sketch-and-sample-error evaluation
(scripts/frostt.py:100-118).

Network access is optional and gated: in an air-gapped environment, drop
the ``.tns.gz`` (or the cached ``.npz``) into the cache directory and the
loader uses it; otherwise a download is attempted and any failure produces
an actionable error naming the URL and the expected local path.
"""
from __future__ import annotations

import gzip
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, Optional, Tuple, Union

import numpy as np

from tt_sketch_tpu.formats import SparseTensor

DEFAULT_CACHE = Path("data")

#: Generator version stamped into synthetic npz caches.  ``_synthesize``
#: changed semantics in round 2 (uniform random support → Cartesian subgrid
#: of a ground-truth TT); an unversioned pre-existing cache would silently
#: keep serving the old incompressible tensor.  Bump on any change to
#: ``_synthesize`` / ``_grid_sizes``.
_SYNTH_VERSION = 2


@dataclass(frozen=True)
class FrosttInfo:
    name: str
    url: str
    nnz: int
    shape: Tuple[int, ...]


FROSTT_TENSORS: Dict[str, FrosttInfo] = {
    info.name: info
    for info in [
        FrosttInfo(
            "nips",
            "https://s3.us-east-2.amazonaws.com/frostt/frostt_data/nips/nips.tns.gz",
            3101609,
            (2482, 2862, 14036, 17),
        ),
        FrosttInfo(
            "uber",
            "https://s3.us-east-2.amazonaws.com/frostt/frostt_data/uber-pickups/uber.tns.gz",
            3309490,
            (183, 24, 1140, 1717),
        ),
        FrosttInfo(
            "lbnl-network",
            "https://s3.us-east-2.amazonaws.com/frostt/frostt_data/lbnl-network/lbnl-network.tns.gz",
            1698825,
            (1605, 4198, 1631, 4209, 868131),
        ),
        FrosttInfo(
            "matmul_5-5-5",
            "https://s3.us-east-2.amazonaws.com/frostt/frostt_data/matrix-multiplication/matmul_5-5-5.tns.gz",
            125,
            (25, 25, 25),
        ),
        # Synthetic stand-ins at the exact shape/nnz of the real tensors,
        # for air-gapped environments (values from a deterministic
        # ground-truth TT + noise, so rank sweeps stay informative).
        FrosttInfo(
            "uber-synthetic",
            "synthetic://uber",
            3309490,
            (183, 24, 1140, 1717),
        ),
        FrosttInfo(
            "nips-synthetic",
            "synthetic://nips",
            3101609,
            (2482, 2862, 14036, 17),
        ),
        # Scattered (i.i.d. index) support at lbnl-network's exact
        # shape/nnz: a subgrid of a tensor with an 868131-sized mode would
        # only have ~18 distinct values per mode, which exercises nothing.
        # Scattered support has no low-rank structure (sample errors ~1 by
        # construction) — this entry exists for the huge-mode kernel path
        # and the throughput record, not for a compression story.
        FrosttInfo(
            "lbnl-synthetic",
            "synthetic-scatter://lbnl-network",
            1698825,
            (1605, 4198, 1631, 4209, 868131),
        ),
    ]
}


def _grid_sizes(shape: Tuple[int, ...], nnz: int) -> Tuple[int, ...]:
    """Per-mode subset sizes whose product ≈ ``nnz``, each ≤ the mode size.

    Small modes are fixed first (they may cap below the geometric mean);
    the remaining budget is re-spread over the larger modes."""
    d = len(shape)
    sizes = [0] * d
    order = sorted(range(d), key=lambda i: shape[i])
    remaining = float(nnz)
    left = d
    for i in order:
        s = max(1, min(shape[i], int(round(remaining ** (1.0 / left)))))
        sizes[i] = s
        remaining = max(1.0, remaining / s)
        left -= 1
    return tuple(sizes)


def _synthesize(info: FrosttInfo, seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic COO data (indices, entries) at a real FROSTT scale.

    The nonzero pattern is a Cartesian subgrid (a random index subset per
    mode, product of sizes ≈ the real tensor's nnz), and the values are a
    rank-12 exp-decay ground-truth TT evaluated on that subgrid plus 10%
    multiplicative noise.  A sparse tensor whose support is a subgrid of a
    TT *is itself* a TT of the same rank (zero-pad the cores outside the
    subsets), so rank sweeps on it behave like on compressible real data:
    the sample error falls with rank down to the ~10% noise floor, instead
    of sitting at ≈1 as it does for uniformly-scattered indices (a sparse
    tensor with i.i.d. random support has no low-rank structure to find).

    Runs entirely on the host (numpy cores + one numpy contraction): data
    generation must never touch the device — on a tunneled TPU backend a
    per-chunk device→host readback can stall for minutes (CLAUDE.md).
    """
    shape = info.shape
    d = len(shape)
    rng = np.random.default_rng(
        np.random.SeedSequence([seed, len(info.name), info.nnz])
    )
    if info.url.startswith("synthetic-scatter://"):
        # i.i.d. scattered support (see the registry note: exercises the
        # huge-mode kernel path; carries no low-rank structure)
        idx = np.stack(
            [rng.integers(0, n, info.nnz) for n in shape]
        ).astype(np.int64)
        vals = rng.standard_normal(info.nnz)
        return idx, vals
    sizes = _grid_sizes(shape, info.nnz)
    subsets = [
        np.sort(rng.choice(n, size=s, replace=False))
        for n, s in zip(shape, sizes)
    ]
    nnz = int(np.prod(sizes))
    mesh = np.meshgrid(*subsets, indexing="ij")
    idx = np.stack([m.reshape(-1) for m in mesh])

    rank = 12
    core_rng = np.random.default_rng(
        np.random.SeedSequence([seed + 7, info.nnz])
    )
    cores = [core_rng.standard_normal((1, shape[0], rank)) / np.sqrt(rank)]
    for n in shape[1:-1]:
        cores.append(
            core_rng.standard_normal((rank, n, rank)) / np.sqrt(rank)
        )
    cores.append(core_rng.standard_normal((rank, shape[-1], 1)))
    # decaying spectrum: scale first-core columns so the tensor is
    # TT-compressible (like count data with a few dominant patterns)
    decay = np.exp(-np.arange(rank) / 2.0)
    cores[0] = cores[0] * decay[None, None, :]

    # contract the sliced cores into the dense subgrid, then flatten in the
    # same C order as the meshgrid above
    v = cores[0][0, subsets[0], :]  # (s0, r)
    for k in range(1, d):
        v = np.tensordot(v, cores[k][:, subsets[k], :], axes=([-1], [0]))
    vals = v.reshape(nnz)
    vals *= 1.0 + 0.1 * rng.standard_normal(nnz)
    return idx, vals


def parse_tns(path: Union[str, Path], shape: Optional[Tuple[int, ...]] = None
              ) -> SparseTensor:
    """Parse a FROSTT ``.tns`` / ``.tns.gz`` file into a ``SparseTensor``.

    Format: one nonzero per line, 1-based indices then the value.  Parsed
    with a single ``np.loadtxt`` pass (the reference loops per line).
    """
    path = Path(path)
    opener = gzip.open if path.suffix == ".gz" else open
    with opener(path, "rb") as f:
        mat = np.loadtxt(f, dtype=np.float64, ndmin=2)
    if mat.size == 0:
        raise ValueError(f"{path} contains no nonzeros")
    indices = mat[:, :-1].astype(np.int64).T - 1  # 1-based -> 0-based
    entries = mat[:, -1]
    if shape is None:
        shape = tuple(int(m) + 1 for m in indices.max(axis=1))
    return SparseTensor(tuple(shape), indices, entries)


def _download(url: str, dest: Path) -> None:
    import urllib.request

    dest.parent.mkdir(parents=True, exist_ok=True)
    tmp = dest.with_suffix(dest.suffix + ".part")
    with urllib.request.urlopen(url, timeout=60) as r, open(tmp, "wb") as f:
        while True:
            chunk = r.read(1 << 20)
            if not chunk:
                break
            f.write(chunk)
    tmp.rename(dest)


def load_frostt(
    name: str,
    cache_dir: Union[str, Path] = DEFAULT_CACHE,
    download: bool = True,
    psi_plan: bool = False,
    plan_kwargs: Optional[dict] = None,
) -> SparseTensor:
    """Load a FROSTT tensor by registry name, with npz caching.

    Resolution order: ``<cache>/<file>.npz`` → ``<cache>/<file>.tns.gz``
    (parsed then cached) → network download (if ``download``).

    ``psi_plan=True`` attaches the sorted/grouped Ψ plans
    (kernels/sparse_plan.py) built **from the host-side arrays before any
    device transfer** — the supported way to get planned tensors on a
    tunneled TPU backend, where a later device→host readback of the
    indices can stall (CLAUDE.md).
    """
    if name not in FROSTT_TENSORS:
        raise KeyError(
            f"unknown FROSTT tensor {name!r}; available: "
            f"{sorted(FROSTT_TENSORS)}"
        )
    info = FROSTT_TENSORS[name]
    cache = Path(cache_dir)
    gz_path = cache / info.url.rsplit("/", 1)[-1]
    npz_path = gz_path.with_suffix("").with_suffix(".npz")

    if info.url.startswith(("synthetic://", "synthetic-scatter://")):
        npz_path = cache / f"{info.name}.npz"

    def _mk(shape, np_indices, np_entries) -> SparseTensor:
        plan = None
        if psi_plan:
            from tt_sketch_tpu.kernels.sparse_plan import build_psi_plan

            plan = build_psi_plan(
                np_indices, shape, entries=np_entries, **(plan_kwargs or {})
            )
        return SparseTensor(shape, np_indices, np_entries, psi_plan=plan)

    synthetic = info.url.startswith(("synthetic://", "synthetic-scatter://"))
    if npz_path.exists():
        with np.load(npz_path) as data:
            cached_version = (
                int(data["synth_version"]) if "synth_version" in data else 0
            )
            if not synthetic or cached_version == _SYNTH_VERSION:
                return _mk(
                    tuple(int(s) for s in data["shape"]),
                    data["indices"],
                    data["entries"],
                )
        # stale synthetic cache from an older generator: regenerate below
        npz_path.unlink()
    if synthetic:
        np_indices, np_entries = _synthesize(info)
        cache.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(
            npz_path,
            indices=np_indices,
            entries=np_entries,
            shape=np.asarray(info.shape),
            synth_version=np.asarray(_SYNTH_VERSION),
        )
        return _mk(info.shape, np_indices, np_entries)
    if not gz_path.exists():
        if not download:
            raise FileNotFoundError(
                f"FROSTT tensor {name!r} not cached: place {gz_path} (from "
                f"{info.url}) or {npz_path} in {cache}/"
            )
        try:
            _download(info.url, gz_path)
        except Exception as e:
            raise FileNotFoundError(
                f"could not download {info.url} ({type(e).__name__}: {e}); "
                f"in an offline environment place the file at {gz_path}"
            ) from e
    opener = gzip.open if gz_path.suffix == ".gz" else open
    with opener(gz_path, "rb") as f:
        mat = np.loadtxt(f, dtype=np.float64, ndmin=2)
    np_indices = mat[:, :-1].astype(np.int64).T - 1
    np_entries = np.ascontiguousarray(mat[:, -1])
    cache.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        npz_path,
        indices=np_indices,
        entries=np_entries,
        shape=np.asarray(info.shape),
    )
    return _mk(info.shape, np_indices, np_entries)


def sample_error(tt, tensor: SparseTensor, n_samples: int = 10_000,
                 seed: int = 0) -> float:
    """Relative error of ``tt`` against ``n_samples`` of the tensor's
    nonzeros (reference scripts/frostt.py:110-118) — the evaluation used
    for tensors too large to densify."""
    rng = np.random.default_rng(seed)
    nnz = int(np.asarray(tensor.entries).shape[0])
    sample = rng.choice(nnz, size=min(n_samples, nnz), replace=False)
    inds = np.asarray(tensor.indices)[:, sample]
    entr = np.asarray(tensor.entries)[sample]
    approx = np.asarray(tt.gather(inds))
    return float(np.linalg.norm(approx - entr) / np.linalg.norm(entr))
