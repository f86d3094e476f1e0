"""Dense index: build pass, on-disk format, HBM residency.

Replaces the reference's ChromaDB/hnswlib dependency and its `.npy`
disk fallback (``generate_embeddings_parallel.py:271-468``,
``save_embeddings_to_disk.py:15-117``) with the framework's own store:

- build: L2-normalize embeddings (idempotent if the encoder already
  normalized), attach per-row category ids + uint32 masks, optional
  int8 symmetric quantization (ops/quant.py);
- disk: batch-numbered ``.npy`` shards + ``index.json`` manifest
  (mirrors the reference's manifest contract at
  ``save_embeddings_to_disk.py:64-75`` — batch files, counts, dim —
  plus dtype/quantization/category metadata);
- device: ``to_device()`` places the matrix in HBM — replicated on one
  chip or row-sharded over a mesh (parallel/mesh.py) for configs[5].

Row order follows the embed pass; when quality filtering makes index
rows a subset of corpus rows, ``chunk_ids`` records the row→chunk_id
mapping and the engine joins metadata through it.
"""

from __future__ import annotations

import dataclasses
import json
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from arxiv_rag_tpu.logging_utils import get_logger
from arxiv_rag_tpu.ops.quant import quantize_int8

log = get_logger("index")

MANIFEST_NAME = "index.json"


@dataclass
class IndexManifest:
    num_rows: int
    dim: int
    dtype: str  # float32 | bfloat16 | int8
    normalized: bool
    categories: list[str] = field(default_factory=list)
    shards: list[dict] = field(default_factory=list)  # {file, num_rows, row_offset}
    model: str = ""
    created_at: float = 0.0

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=1)

    @classmethod
    def from_json(cls, text: str) -> "IndexManifest":
        return cls(**json.loads(text))


def _l2_normalize(x: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    return x / np.maximum(norms, 1e-12)


def build_index(
    embeddings: np.ndarray,
    categories: Sequence[str] | None = None,
    category_names: Sequence[str] | None = None,
    dtype: str = "bfloat16",
    normalize: bool = True,
    chunk_ids: Sequence[str] | None = None,
) -> "DenseIndex":
    """Build an in-memory DenseIndex from an [N, D] embedding matrix."""
    emb = np.asarray(embeddings, np.float32)
    if normalize:
        emb = _l2_normalize(emb)
    if categories is not None:
        from arxiv_rag_tpu.ops.topk import make_row_masks

        cats = list(category_names) if category_names else sorted(set(categories))
        row_masks = make_row_masks(np.asarray(categories, object), cats)
    else:
        cats, row_masks = [], None

    if dtype == "int8":
        values, scales = quantize_int8(emb)
        return DenseIndex(
            values=np.asarray(values), scales=np.asarray(scales), dtype="int8",
            normalized=normalize, categories=cats, row_masks=row_masks,
            chunk_ids=list(chunk_ids) if chunk_ids is not None else None,
        )
    values = emb.astype(jnp.bfloat16) if dtype == "bfloat16" else emb
    return DenseIndex(
        values=np.asarray(values), scales=None, dtype=dtype,
        normalized=normalize, categories=cats, row_masks=row_masks,
        chunk_ids=list(chunk_ids) if chunk_ids is not None else None,
    )


def build_index_device(
    embeddings,
    categories: Sequence[str] | None = None,
    category_names: Sequence[str] | None = None,
    dtype: str = "bfloat16",
    normalize: bool = True,
    chunk_ids: Sequence[str] | None = None,
    batch_rows: int = 262144,
) -> "DenseIndex":
    """Index build as a TPU pass (SURVEY §7 step 3): L2-normalize and
    (optionally) int8-quantize on device in row batches — the
    multi-million-row builds the 1-core host would crawl through.

    ``embeddings`` may be a numpy array or a jax array already on
    device. Output matches ``build_index`` bit-for-bit up to fp rounding
    differences between XLA and numpy (tested).
    """
    import functools

    @functools.partial(jax.jit, static_argnames=("do_norm",))
    def _normalize(x, do_norm):
        x = x.astype(jnp.float32)
        if do_norm:
            x = x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        return x

    @jax.jit
    def _quant(x):
        return quantize_int8(x)

    n = embeddings.shape[0]
    out_vals = []
    out_scales = []
    for start in range(0, n, batch_rows):
        chunk = jnp.asarray(embeddings[start : start + batch_rows])
        norm = _normalize(chunk, normalize)
        if dtype == "int8":
            v, s = _quant(norm)
            out_vals.append(np.asarray(v))
            out_scales.append(np.asarray(s))
        elif dtype == "bfloat16":
            out_vals.append(np.asarray(norm.astype(jnp.bfloat16)))
        else:
            out_vals.append(np.asarray(norm))
    values = (
        np.concatenate(out_vals)
        if out_vals
        else np.zeros((0, embeddings.shape[1]), np.float32)
    )
    scales = np.concatenate(out_scales) if out_scales else None

    if categories is not None:
        from arxiv_rag_tpu.ops.topk import make_row_masks

        cats = list(category_names) if category_names else sorted(set(categories))
        row_masks = make_row_masks(np.asarray(categories, object), cats)
    else:
        cats, row_masks = [], None
    return DenseIndex(
        values=values, scales=scales, dtype=dtype, normalized=normalize,
        categories=cats, row_masks=row_masks,
        chunk_ids=list(chunk_ids) if chunk_ids is not None else None,
    )


def append_index(
    directory: str | Path,
    embeddings: np.ndarray,
    categories: Sequence[str] | None = None,
    chunk_ids: Sequence[str] | None = None,
    rows_per_shard: int = 262144,
    device: bool = False,
) -> "DenseIndex":
    """Incrementally grow an on-disk index — the ChromaDB
    ``collection.add`` behavior the reference relies on for continuous
    ingestion (``generate_embeddings_parallel.py:323-468``), which a
    batch-only builder would force into a full rebuild per drop of new
    papers.

    New rows are normalized/quantized with the SAME dtype/normalize
    settings recorded in the base manifest, written as NEW shard files
    (existing shards are never rewritten), and the sidecar arrays +
    manifest are updated last (manifest replace is atomic; ``load``
    trims sidecars to ``num_rows``, so a crash between sidecar and
    manifest writes leaves the base index intact and loadable).

    Category vocabulary grows in place: existing categories keep their
    bit positions, unseen ones append (32 max). Masked/unmasked and
    chunk-id'd/anonymous bases must stay that way — mixing would make
    filtered search silently wrong for half the corpus.

    Returns the re-loaded combined index. An existing IVF delta in the
    same directory goes stale; refresh it with ``IVFIndex.extend``.
    """
    directory = Path(directory)
    manifest = IndexManifest.from_json((directory / MANIFEST_NAME).read_text())
    emb = np.asarray(embeddings)
    if emb.ndim != 2 or emb.shape[1] != manifest.dim:
        raise ValueError(
            f"appended embeddings have shape {emb.shape}; index dim is "
            f"{manifest.dim}"
        )
    has_masks = (directory / "row_masks.npy").exists()
    if has_masks != (categories is not None):
        raise ValueError(
            "category parity: the base index "
            + ("has" if has_masks else "has no")
            + " row masks, so appended rows must "
            + ("also carry categories" if has_masks else "not carry categories")
        )
    has_ids = (directory / "chunk_ids.json").exists()
    if has_ids != (chunk_ids is not None):
        raise ValueError(
            "chunk-id parity: the base index "
            + ("maps rows to chunk_ids" if has_ids else "has no chunk_ids")
            + ", so appended rows must match"
        )
    if chunk_ids is not None and len(chunk_ids) != emb.shape[0]:
        raise ValueError(
            f"{len(chunk_ids)} chunk_ids for {emb.shape[0]} appended rows"
        )
    cats = list(manifest.categories)
    if categories is not None:
        if len(categories) != emb.shape[0]:
            raise ValueError(
                f"{len(categories)} categories for {emb.shape[0]} appended rows"
            )
        for c in sorted(set(categories)):
            if c not in cats:
                cats.append(c)
        if len(cats) > 32:
            raise ValueError("more than 32 categories needs a wider mask")

    builder = build_index_device if device else build_index
    new = builder(
        emb, categories=categories, category_names=cats,
        dtype=manifest.dtype, normalize=manifest.normalized,
        chunk_ids=chunk_ids,
    )

    def _atomic_save(name: str, arr: np.ndarray) -> None:
        tmp = directory / (name + ".tmp.npy")
        np.save(tmp, arr)
        tmp.replace(directory / name)

    shards = list(manifest.shards)
    base_rows, i0 = manifest.num_rows, len(shards)
    for j, start in enumerate(range(0, new.num_rows, rows_per_shard)):
        stop = min(start + rows_per_shard, new.num_rows)
        chunk = new.values[start:stop]
        if manifest.dtype == "bfloat16":
            import ml_dtypes

            chunk = np.asarray(chunk, ml_dtypes.bfloat16).view(np.uint16)
        name = f"embeddings-{i0 + j:05d}.npy"
        np.save(directory / name, chunk)
        shards.append(
            {"file": name, "num_rows": stop - start,
             "row_offset": base_rows + start}
        )
    if new.scales is not None:
        _atomic_save(
            "scales.npy",
            np.concatenate([np.load(directory / "scales.npy"), new.scales]),
        )
    if categories is not None:
        _atomic_save(
            "row_masks.npy",
            np.concatenate([np.load(directory / "row_masks.npy"), new.row_masks]),
        )
    if chunk_ids is not None:
        old_ids = json.loads((directory / "chunk_ids.json").read_text())
        tmp = directory / "chunk_ids.json.tmp"
        tmp.write_text(json.dumps(old_ids + list(chunk_ids)))
        tmp.replace(directory / "chunk_ids.json")
    manifest.num_rows = base_rows + new.num_rows
    manifest.categories = cats
    manifest.shards = shards
    manifest.created_at = time.time()
    tmp = directory / (MANIFEST_NAME + ".tmp")
    tmp.write_text(manifest.to_json())
    tmp.replace(directory / MANIFEST_NAME)
    log.info("appended %d rows to index (%d total, %d shards)",
             new.num_rows, manifest.num_rows, len(shards))
    return DenseIndex.load(directory)


@dataclass
class DenseIndex:
    values: np.ndarray  # [N, D] float32/bfloat16/int8
    scales: np.ndarray | None  # [N] fp32 for int8
    dtype: str
    normalized: bool
    categories: list[str]
    row_masks: np.ndarray | None  # [N] uint32
    model: str = ""
    # optional row -> chunk_id mapping (needed when the embed pass
    # filtered rows, so index rows != corpus rows)
    chunk_ids: list[str] | None = None

    # device-side state, populated by to_device()
    _device_values: jax.Array | None = None
    _device_scales: jax.Array | None = None
    _device_masks: jax.Array | None = None
    _mesh: object | None = None
    _n_valid: int = 0

    @property
    def num_rows(self) -> int:
        return self.values.shape[0]

    @property
    def dim(self) -> int:
        return self.values.shape[1]

    def category_mask(self, wanted: Sequence[str] | None) -> np.uint32:
        """uint32 query mask selecting the given categories (None = all)."""
        if wanted is None:
            return np.uint32(0xFFFFFFFF)
        bits = np.uint32(0)
        for c in wanted:
            if c not in self.categories:
                raise KeyError(f"unknown category {c!r}; index has {self.categories}")
            bits |= np.uint32(1 << self.categories.index(c))
        return bits

    # -- persistence -----------------------------------------------------

    def save(self, directory: str | Path, rows_per_shard: int = 262144) -> None:
        directory = Path(directory)
        directory.mkdir(parents=True, exist_ok=True)
        shards = []
        for i, start in enumerate(range(0, self.num_rows, rows_per_shard)):
            stop = min(start + rows_per_shard, self.num_rows)
            name = f"embeddings-{i:05d}.npy"
            # bfloat16 stored as raw uint16 bits; the view stays on the
            # HOST (ml_dtypes) — round-tripping through jnp here costs a
            # full device transfer each way on a tunneled TPU (measured
            # 299s to load a 3 GB index before this fix)
            chunk = self.values[start:stop]
            if self.dtype == "bfloat16":
                import ml_dtypes

                chunk = np.asarray(chunk, ml_dtypes.bfloat16).view(np.uint16)
            np.save(directory / name, chunk)
            shards.append({"file": name, "num_rows": stop - start, "row_offset": start})
        if self.scales is not None:
            np.save(directory / "scales.npy", self.scales)
        if self.row_masks is not None:
            np.save(directory / "row_masks.npy", self.row_masks)
        if self.chunk_ids is not None:
            (directory / "chunk_ids.json").write_text(json.dumps(self.chunk_ids))
        manifest = IndexManifest(
            num_rows=self.num_rows, dim=self.dim, dtype=self.dtype,
            normalized=self.normalized, categories=self.categories,
            shards=shards, model=self.model, created_at=time.time(),
        )
        tmp = directory / (MANIFEST_NAME + ".tmp")
        tmp.write_text(manifest.to_json())
        tmp.replace(directory / MANIFEST_NAME)
        log.info("saved index: %d rows × %d dim (%s) in %d shards",
                 self.num_rows, self.dim, self.dtype, len(shards))

    @classmethod
    def load(cls, directory: str | Path) -> "DenseIndex":
        directory = Path(directory)
        manifest = IndexManifest.from_json((directory / MANIFEST_NAME).read_text())
        parts = []
        for s in manifest.shards:
            arr = np.load(directory / s["file"])
            if manifest.dtype == "bfloat16":
                import ml_dtypes

                arr = arr.view(ml_dtypes.bfloat16)  # host-side reinterpret
            parts.append(arr)
        values = np.concatenate(parts) if parts else np.zeros((0, manifest.dim))
        # sidecars trim to the manifest's row count: append_index writes
        # them before the (atomic) manifest replace, so a crash in
        # between leaves longer sidecars next to the OLD manifest — the
        # base index must still load cleanly
        scales = None
        if (directory / "scales.npy").exists():
            scales = np.load(directory / "scales.npy")[: manifest.num_rows]
        row_masks = None
        if (directory / "row_masks.npy").exists():
            row_masks = np.load(directory / "row_masks.npy")[: manifest.num_rows]
        chunk_ids = None
        if (directory / "chunk_ids.json").exists():
            chunk_ids = json.loads(
                (directory / "chunk_ids.json").read_text()
            )[: manifest.num_rows]
        return cls(
            values=values, scales=scales, dtype=manifest.dtype,
            normalized=manifest.normalized, categories=manifest.categories,
            row_masks=row_masks, model=manifest.model, chunk_ids=chunk_ids,
        )

    # -- device placement --------------------------------------------------

    def to_device(self, mesh=None, row_multiple: int = 4096) -> "DenseIndex":
        """Place the index in HBM: replicated (mesh=None) or row-sharded.

        Rows are padded to a block/shard multiple; searches mask global
        ids >= n_valid so padding never surfaces.
        """
        self._mesh = mesh
        self._n_valid = self.num_rows
        jt = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "int8": jnp.int8}[self.dtype]
        vals = jnp.asarray(self.values, jt)
        if mesh is None:
            pad = (-self.num_rows) % row_multiple
            if pad:
                vals = jnp.pad(vals, ((0, pad), (0, 0)))
            self._device_values = jax.device_put(vals)
            if self.scales is not None:
                s = jnp.pad(jnp.asarray(self.scales), (0, pad)) if pad else jnp.asarray(self.scales)
                self._device_scales = jax.device_put(s)
            if self.row_masks is not None:
                m = jnp.asarray(self.row_masks.astype(np.int32))
                if pad:
                    m = jnp.pad(m, (0, pad))
                self._device_masks = jax.device_put(m)
        else:
            from arxiv_rag_tpu.parallel.mesh import shard_index_rows

            self._device_values, _ = shard_index_rows(vals, mesh, extra_row_multiple=row_multiple)
            if self.scales is not None:
                s = jnp.asarray(self.scales, jnp.float32).reshape(-1, 1)
                sharded, _ = shard_index_rows(s, mesh, extra_row_multiple=row_multiple)
                self._device_scales = sharded.reshape(-1)
            if self.row_masks is not None:
                m = jnp.asarray(self.row_masks.astype(np.int32)).reshape(-1, 1)
                sharded, _ = shard_index_rows(m, mesh, extra_row_multiple=row_multiple)
                self._device_masks = sharded.reshape(-1)
        return self
