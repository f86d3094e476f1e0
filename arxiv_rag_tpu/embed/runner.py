"""TPU embedding runner: length-bucketed batching over the jitted encoder.

Replaces the reference's N-process replicated-model embedding pool
(``generate_embeddings_parallel.py:179-269``: mp.Pool, a SentenceTransformer
copy per worker, 500-chunk tasks, 200-text sub-batches) with one SPMD
program: tokenize on host, bucket by token length to a small set of
padded shapes (XLA compiles one executable per (batch, bucket) pair —
SURVEY §7 hard part 5: shape discipline), run the jitted MPNet forward,
and restore original order by position index.

Where the reference reconciles embedding counts after the fact and pads
zero vectors on failure (``:236-267`` — a defect SURVEY §7 says not to
replicate), order restoration here is by construction and there is no
silent-zero path.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from arxiv_rag_tpu.logging_utils import METRICS, get_logger
from arxiv_rag_tpu.models.mpnet import ModelConfig, MPNetParams, encode
from arxiv_rag_tpu.tokenize import WordPieceTokenizer

log = get_logger("embed")


@dataclass
class EmbedStats:
    texts: int = 0
    batches: int = 0
    padded_slots: int = 0
    tokens: int = 0


class Embedder:
    """Batched sentence-embedding generation on TPU.

    Args:
        params/cfg: the functional MPNet (models/mpnet.py).
        tokenizer: WordPiece tokenizer with MPNet specials.
        buckets: padded sequence lengths, ascending (default from
            EmbeddingConfig.length_buckets; 384 matches
            all-mpnet-base-v2's max_seq_length).
        batch_size: rows per device batch (pad-to-full for one compiled
            shape per bucket).
        compute_dtype: bf16 on TPU; fp32 for CPU parity runs.
        mesh: optional 1-D mesh — batches shard on the data axis
            (SPMD data parallelism replacing the reference's process pool).
    """

    def __init__(
        self,
        params: MPNetParams,
        cfg: ModelConfig,
        tokenizer: WordPieceTokenizer,
        *,
        buckets: Sequence[int] = (64, 128, 256, 384),
        batch_size: int = 512,
        batch_sizes: Sequence[int] | None = None,
        compute_dtype: jnp.dtype = jnp.bfloat16,
        normalize: bool = True,
        mesh=None,
        native_tokenizer=None,
        quant_int8: bool = False,
    ) -> None:
        if quant_int8:
            # W8A8 forward: dense kernels to per-channel int8 once here;
            # activations quantize dynamically inside the jitted forward
            from arxiv_rag_tpu.models.mpnet import quantize_params_int8

            params = quantize_params_int8(params)
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        # optional C++ batch encoder (tokenize/native.py) — same contract,
        # multithreaded; falls back to the Python path when None
        self.native_tokenizer = native_tokenizer
        self.buckets = tuple(sorted(buckets))
        # allowed padded batch heights, ascending. Bulk embedding wants
        # one big shape (default); SERVING windows are small and varied —
        # padding a 48-query window to 512 slots wastes 10x the encode
        # compute, so the query-time embedder passes e.g. (64, 512) and
        # each batch pads to the smallest height that fits. Under a mesh,
        # every height must divide by the device count.
        self.batch_sizes = (
            tuple(sorted(batch_sizes)) if batch_sizes else (batch_size,)
        )
        self.batch_size = max(self.batch_sizes)
        self.compute_dtype = compute_dtype
        self.normalize = normalize
        self.mesh = mesh
        self.stats = EmbedStats()
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = mesh.axis_names[0]
            self._data_sharding = NamedSharding(mesh, P(axis, None))
            self._replicated = NamedSharding(mesh, P())
            self.params = jax.device_put(self.params, self._replicated)
        else:
            self._data_sharding = None

        self._encode = jax.jit(
            partial(
                encode,
                cfg=cfg,
                compute_dtype=compute_dtype,
                normalize=normalize,
            )
        )

    # -- host side -------------------------------------------------------

    def _bucket_for(self, n_tokens: int) -> int:
        for b in self.buckets:
            if n_tokens <= b:
                return b
        return self.buckets[-1]

    def tokenize_bucketed(
        self, texts: Sequence[str]
    ) -> dict[int, tuple[list[int], np.ndarray, np.ndarray]]:
        """Tokenize and group rows by length bucket.

        Returns {bucket: (original positions, ids [n, bucket], mask)}."""
        max_b = self.buckets[-1]
        if self.native_tokenizer is not None:
            return self._tokenize_bucketed_native(texts, max_b)
        per_bucket: dict[int, list[tuple[int, list[int]]]] = {b: [] for b in self.buckets}
        for pos, text in enumerate(texts):
            enc = self.tokenizer.encode(text, max_len=max_b)
            per_bucket[self._bucket_for(len(enc))].append((pos, enc))
        out = {}
        for bucket, rows in per_bucket.items():
            if not rows:
                continue
            ids = np.full((len(rows), bucket), self.tokenizer.pad_id, np.int32)
            mask = np.zeros((len(rows), bucket), np.int32)
            positions = []
            for r, (pos, enc) in enumerate(rows):
                ids[r, : len(enc)] = enc
                mask[r, : len(enc)] = 1
                positions.append(pos)
                self.stats.tokens += len(enc)
            out[bucket] = (positions, ids, mask)
        return out

    def _tokenize_bucketed_native(
        self, texts: Sequence[str], max_b: int
    ) -> dict[int, tuple[list[int], np.ndarray, np.ndarray]]:
        """One multithreaded C++ pass at the max bucket, then regroup
        rows into buckets by true length (column slice — no re-encode)."""
        ids_full, mask_full = self.native_tokenizer.encode_batch(texts, max_len=max_b)
        lengths = mask_full.sum(axis=1)
        self.stats.tokens += int(lengths.sum())
        out: dict[int, tuple[list[int], np.ndarray, np.ndarray]] = {}
        row_bucket = np.empty(len(texts), np.int64)
        for pos in range(len(texts)):
            row_bucket[pos] = self._bucket_for(int(lengths[pos]))
        for bucket in self.buckets:
            rows = np.nonzero(row_bucket == bucket)[0]
            if rows.size == 0:
                continue
            out[bucket] = (rows.tolist(), ids_full[rows, :bucket], mask_full[rows, :bucket])
        return out

    # -- device side -----------------------------------------------------

    def _padded_height(self, n: int) -> int:
        """Smallest allowed batch height that fits n rows."""
        for b in self.batch_sizes:
            if n <= b:
                return b
        return self.batch_sizes[-1]

    def _iter_batches(self, positions, ids, mask):
        """Yield (bpos, bids, bmask, n) slices padded to a compiled
        batch height (pad rows get one CLS token so pooling never
        divides by zero)."""
        for start in range(0, len(positions), self.batch_size):
            bpos = positions[start : start + self.batch_size]
            bids = ids[start : start + self.batch_size]
            bmask = mask[start : start + self.batch_size]
            n = len(bpos)
            height = self._padded_height(n)
            if n < height:
                pad = height - n
                bids = np.pad(bids, ((0, pad), (0, 0)),
                              constant_values=self.tokenizer.pad_id)
                bmask = np.pad(bmask, ((0, pad), (0, 0)))
                bids[n:, 0] = self.tokenizer.cls_id
                bmask[n:, 0] = 1
                self.stats.padded_slots += pad
            self.stats.batches += 1
            yield bpos, bids, bmask, n

    def _run_batch(self, ids: np.ndarray, mask: np.ndarray) -> jax.Array:
        x_ids, x_mask = jnp.asarray(ids), jnp.asarray(mask)
        if self._data_sharding is not None:
            x_ids = jax.device_put(x_ids, self._data_sharding)
            x_mask = jax.device_put(x_mask, self._data_sharding)
        return self._encode(self.params, x_ids, x_mask)

    def encode_texts(self, texts: Sequence[str]) -> np.ndarray:
        """[len(texts), hidden] fp32 embeddings, original order."""
        if not len(texts):
            return np.zeros((0, self.cfg.hidden_size), np.float32)
        out = np.empty((len(texts), self.cfg.hidden_size), np.float32)
        bucketed = self.tokenize_bucketed(texts)
        pending: list[tuple[list[int], jax.Array, int]] = []
        with METRICS.timer("embed.device"):
            for bucket, (positions, ids, mask) in bucketed.items():
                for bpos, bids, bmask, n in self._iter_batches(positions, ids, mask):
                    # async dispatch: host tokenizes/pads the next batch
                    # while the device runs this one
                    pending.append((bpos, self._run_batch(bids, bmask), n))
            for bpos, emb, n in pending:
                out[np.asarray(bpos)] = np.asarray(emb)[:n]
        self.stats.texts += len(texts)
        METRICS.inc("embed.texts", len(texts))
        return out

    def encode_window_device(self, texts: Sequence[str]):
        """(embeddings [H, hidden] ON DEVICE, real row count) for one
        serving window — the shape-stable device handoff.

        Unlike ``encode_texts_device`` (whose per-window-size reorder
        ops compile unboundedly through a remote-compile tunnel), this
        path is a SINGLE padded batch: every text tokenizes at one
        bucket (the largest any of them needs), the batch pads to a
        fixed height, and order is preserved by construction — so the
        device array feeds straight into the scan with zero eager
        reshuffling and a bounded shape set (heights x buckets).
        Returns None when the window exceeds the largest batch height
        (caller falls back to ``encode_texts``)."""
        n = len(texts)
        if n == 0 or n > self.batch_size:
            return None
        max_b = self.buckets[-1]
        if self.native_tokenizer is not None:
            ids_full, mask_full = self.native_tokenizer.encode_batch(
                texts, max_len=max_b
            )
            lengths = mask_full.sum(axis=1)
        else:
            encs = [self.tokenizer.encode(t, max_len=max_b) for t in texts]
            lengths = np.asarray([len(e) for e in encs])
        bucket = self._bucket_for(int(lengths.max()))
        height = self._padded_height(n)
        ids = np.full((height, bucket), self.tokenizer.pad_id, np.int32)
        mask = np.zeros((height, bucket), np.int32)
        if self.native_tokenizer is not None:
            ids[:n] = ids_full[:, :bucket]
            mask[:n] = mask_full[:, :bucket]
        else:
            for r, enc in enumerate(encs):
                ids[r, : len(enc)] = enc
                mask[r, : len(enc)] = 1
        ids[n:, 0] = self.tokenizer.cls_id  # pad rows: one real token
        mask[n:, 0] = 1
        self.stats.tokens += int(lengths.sum())
        self.stats.padded_slots += height - n
        self.stats.batches += 1
        self.stats.texts += n
        METRICS.inc("embed.texts", n)
        with METRICS.timer("embed.device"):
            return self._run_batch(ids, mask), n

    def encode_texts_device(self, texts: Sequence[str]) -> jax.Array:
        """[len(texts), hidden] fp32 embeddings, original order, ON
        DEVICE — no host fetch.  For pipelines that feed the embeddings
        straight into another device op (serving: query encode → fused
        scan), where ``encode_texts``'s numpy round trip costs two extra
        tunnel transfers per window and serializes the device queue.
        Order restoration is a device-side ``take``."""
        if not len(texts):
            return jnp.zeros((0, self.cfg.hidden_size), jnp.float32)
        bucketed = self.tokenize_bucketed(texts)
        parts: list[jax.Array] = []
        pos_all: list[int] = []
        with METRICS.timer("embed.device"):
            for bucket, (positions, ids, mask) in bucketed.items():
                for bpos, bids, bmask, n in self._iter_batches(positions, ids, mask):
                    parts.append(self._run_batch(bids, bmask)[:n])
                    pos_all.extend(bpos)
        emb = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        inv = np.empty(len(texts), np.int64)
        inv[np.asarray(pos_all)] = np.arange(len(texts))
        self.stats.texts += len(texts)
        METRICS.inc("embed.texts", len(texts))
        return jnp.take(emb, jnp.asarray(inv), axis=0)
