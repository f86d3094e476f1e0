"""Typed configuration for the whole framework.

Replaces the reference's single stringly-typed YAML dict
(``3-chunks/pipeline/config.yaml:1-101`` consumed via ``.get`` chains in
``pipeline.py:36-68``) with frozen dataclasses, explicit defaults, YAML
loading, environment-variable overrides and dotted-path CLI overrides.

Default values intentionally mirror the reference contract:
- text_processing: 200–2000 chars, 400 overlap (``config.yaml:27-29``)
- chunking: 1024 tokens / 100 overlap, semantic (``config.yaml:33-40``)
- embeddings: all-mpnet-base-v2, 768-d, batch 1024, L2-normalized
  (``config.yaml:43-50``)
- retrieval: top_k 10, hybrid alpha 0.7, rerank top-50
  (``config.yaml:62-69`` — config-only in the reference, implemented here)
- processing: batch 2000, 24 workers, 3 retries (``config.yaml:72-78``)
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field, fields, is_dataclass
from pathlib import Path
from typing import Any, Mapping

import yaml

ENV_PREFIX = "ARAG"


@dataclass(frozen=True)
class PathsConfig:
    """Filesystem layout. The reference hard-codes /Volumes/8SSD/... paths
    (``pipeline.py:81``, ``worker.py:41``); here everything is rooted at
    ``root`` and overridable."""

    root: str = "data"
    pdf_dir: str = "{root}/pdfs"
    extracted_dir: str = "{root}/extracted"
    chunks_dir: str = "{root}/chunks"
    corpus_dir: str = "{root}/corpus"
    index_dir: str = "{root}/index"
    logs_dir: str = "{root}/logs"
    cache_dir: str = "{root}/cache"

    def resolve(self, name: str) -> Path:
        value = getattr(self, name)
        return Path(value.format(root=self.root))


@dataclass(frozen=True)
class DownloadConfig:
    """Mirrors downloader.py behavior knobs (``downloader.py:979-1030``,
    ``1-downloader/README.md:41-49``)."""

    bucket: str = "gs://arxiv-dataset/arxiv/pdf"
    max_workers: int = 40
    max_retries: int = 3
    retry_delay_s: float = 1.0
    timeout_s: float = 120.0
    versions: tuple[str, ...] = ("v1", "v2", "v3", "v4")
    min_free_gb: float = 10.0
    state_every_n: int = 500
    validate_pdf_header: bool = True


@dataclass(frozen=True)
class ExtractionConfig:
    """PDF extraction knobs (``config.yaml:13-19``; quality gates from
    ``pdf_extractor.py:359-365,325``)."""

    backends: tuple[str, ...] = ("pdftext", "pymupdf", "pdfplumber", "pypdf")
    accept_quality: float = 0.95
    accept_quality_large: float = 0.92
    accept_quality_very_large: float = 0.90
    large_pages: int = 200
    very_large_pages: int = 500
    ocr_enabled: bool = False
    ocr_accept_quality: float = 0.6
    # dotted "module.path:callable" implementing the OCR protocol
    # (pipeline/extract/ocr.py); empty = no OCR backend, scanned PDFs
    # fail loudly into the error ledger
    ocr_plugin: str = ""
    max_retries: int = 2
    cache_enabled: bool = True
    expected_chars_per_page: float = 2500.0  # scoring prior, pdf_extractor.py:7618


@dataclass(frozen=True)
class TextConfig:
    """Cleaning + chunk character contract (``config.yaml:22-30``)."""

    min_chunk_chars: int = 200
    max_chunk_chars: int = 2000
    overlap_chars: int = 400
    remove_headers: bool = True
    remove_page_numbers: bool = True
    improve_formulas: bool = True


@dataclass(frozen=True)
class ChunkingConfig:
    """Chunking strategy contract (``config.yaml:33-40``)."""

    method: str = "fixed"  # fixed | sentence | semantic
    target_tokens: int = 1024
    overlap_tokens: int = 100
    semantic_model: str = "sentence-transformers/all-MiniLM-L6-v2"
    semantic_threshold: float = 0.7  # adjacent-cosine boundary, text_processor.py:1547
    semantic_overlap_frac: float = 0.2
    semantic_batch_size: int = 512


@dataclass(frozen=True)
class EmbeddingConfig:
    """Embedding generation contract (``config.yaml:43-50``,
    ``generate_embeddings_parallel.py:470-618``)."""

    model: str = "sentence-transformers/all-mpnet-base-v2"
    dim: int = 768
    batch_size: int = 1024
    max_seq_len: int = 384
    normalize: bool = True
    dtype: str = "bfloat16"  # on-device compute dtype
    min_quality: float = 0.9  # embed-only-quality>=0.9 gate, :476-477
    length_buckets: tuple[int, ...] = (64, 128, 256, 384)


@dataclass(frozen=True)
class IndexConfig:
    """TPU index build/search (new capability; BASELINE.json configs[2-4])."""

    dtype: str = "bfloat16"  # bfloat16 | float32 | int8
    shard_axis: str = "data"
    row_block: int = 1024  # pallas tile rows per grid step
    pad_to: int = 1024


@dataclass(frozen=True)
class RetrievalConfig:
    """Query-time settings (``config.yaml:62-69`` — implemented here)."""

    top_k: int = 10
    hybrid_alpha: float = 0.7  # dense weight; (1-alpha) keyword/BM25
    rerank: bool = False
    rerank_model: str = "cross-encoder/ms-marco-MiniLM-L-6-v2"
    rerank_top_k: int = 50
    # cross-encoder pair truncation (CLS+query+SEP+passage+SEP budget);
    # 256 is the ms-marco convention — a 512-token pair costs >2x the
    # FLOPs. 0 disables (pairs run to the model's max_seq_len).
    rerank_max_pair_len: int = 256
    # window-level admission: if a serving window carries more than this
    # many (query, passage) pairs, rerank depth degrades per-query (the
    # tail keeps dense order, flagged in extras["rerank_degraded"])
    # instead of queueing 10+ s of cross-encoder work. 0 = unbounded.
    rerank_max_window_pairs: int = 2048
    # opt-in cascade (round 5): score every candidate pair at a cheap
    # 64-token truncation first, rescore only each query's top
    # max(k, depth) survivors at full pair length (~1.6x less
    # cross-encoder FLOPs at depth 20 over 50 candidates, ~2.3x at
    # depth 10 — a 64-token MiniLM pair costs ~1/4.3 of a 256-token
    # one). 0 = off
    # (the reference's flagship single-stage config).
    rerank_cascade_depth: int = 0
    query_batch: int = 32
    # IVF (cluster-pruned) retrieval: 0 = flat exact scan (default);
    # >0 = probe that many clusters per query when the index dir carries
    # an IVF delta (`arag index --ivf-clusters`). Approximate — recall
    # rises with nprobe and hits 1.0 at nprobe == n_clusters.
    nprobe: int = 0
    # query-tile height for the IVF kernel: each tile scans the UNION of
    # its queries' probed clusters, so small tiles keep the prune tight
    # (see index/ivf.py docstring for the batching analysis)
    ivf_q_block: int = 8
    # "device" fuses probe + block planning + the pruned scan into one
    # dispatch (no host sync — the host path fetches probe results
    # before it can plan, one full tunnel RTT per call, IVF_r04.json:
    # 2.5x the flat scan at 2M); on a mesh the planning traces inside
    # the shard_map per shard. "host" keeps the exact-union host planner
    ivf_plan: str = "device"


@dataclass(frozen=True)
class ProcessingConfig:
    """Host-side batch processing (``config.yaml:72-78``)."""

    batch_size: int = 2000
    num_workers: int = 24
    max_retries: int = 3
    checkpoint_every: int = 100


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh for pjit/shard_map (new; BASELINE configs[5])."""

    data_axis: int = -1  # -1 = all devices
    axis_name: str = "data"


@dataclass(frozen=True)
class LoggingConfig:
    level: str = "INFO"
    json_lines: bool = False
    file: str = ""


@dataclass(frozen=True)
class Config:
    paths: PathsConfig = field(default_factory=PathsConfig)
    download: DownloadConfig = field(default_factory=DownloadConfig)
    extraction: ExtractionConfig = field(default_factory=ExtractionConfig)
    text: TextConfig = field(default_factory=TextConfig)
    chunking: ChunkingConfig = field(default_factory=ChunkingConfig)
    embedding: EmbeddingConfig = field(default_factory=EmbeddingConfig)
    index: IndexConfig = field(default_factory=IndexConfig)
    retrieval: RetrievalConfig = field(default_factory=RetrievalConfig)
    processing: ProcessingConfig = field(default_factory=ProcessingConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    logging: LoggingConfig = field(default_factory=LoggingConfig)

    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)


def _coerce(value: Any, typ: Any) -> Any:
    """Coerce a YAML/env/CLI value to a dataclass field type."""
    origin = getattr(typ, "__origin__", None)
    if origin is tuple:
        if isinstance(value, str):
            value = [v.strip() for v in value.split(",") if v.strip()]
        args = typ.__args__
        elem = args[0] if args else str
        return tuple(_coerce(v, elem) for v in value)
    if typ is bool:
        if isinstance(value, str):
            return value.lower() in ("1", "true", "yes", "on")
        return bool(value)
    if typ is int:
        return int(value)
    if typ is float:
        return float(value)
    if typ is str:
        return str(value)
    return value


def _build(cls: type, data: Mapping[str, Any], path: str) -> Any:
    kwargs: dict[str, Any] = {}
    known = {f.name: f for f in fields(cls)}
    for key, value in data.items():
        if key not in known:
            raise KeyError(f"unknown config key {path}{key!r}")
        f = known[key]
        sub_cls = (
            f.default_factory
            if f.default_factory is not dataclasses.MISSING and is_dataclass(f.default_factory)
            else None
        )
        if sub_cls is not None:
            if not isinstance(value, Mapping):
                raise TypeError(f"{path}{key} must be a mapping")
            kwargs[key] = _build(sub_cls, value, f"{path}{key}.")
        else:
            kwargs[key] = _coerce(value, f.type if not isinstance(f.type, str) else _resolve_type(f.type))
    return cls(**kwargs)


def _resolve_type(annotation: str) -> Any:
    # dataclass field types arrive as strings under `from __future__ import
    # annotations`; resolve the handful we use.
    ns: dict[str, Any] = {"int": int, "float": float, "str": str, "bool": bool, "tuple": tuple}
    try:
        return eval(annotation, {"__builtins__": {}}, ns)  # noqa: S307 - restricted namespace
    except Exception:
        return str


def _merge(base: dict[str, Any], override: Mapping[str, Any]) -> dict[str, Any]:
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, Mapping) and isinstance(out.get(k), Mapping):
            out[k] = _merge(out[k], v)  # type: ignore[arg-type]
        else:
            out[k] = v
    return out


def _env_overrides(environ: Mapping[str, str]) -> dict[str, Any]:
    """ARAG__SECTION__KEY=value → {"section": {"key": value}}.

    Replaces the reference's ad-hoc ARXIV_RAG_PDF_DIR / ARXIV_RAG_CACHE_DIR
    env vars (``pdf_extractor.py:53-60``) with a uniform scheme.
    """
    out: dict[str, Any] = {}
    prefix = ENV_PREFIX + "__"
    for key, value in environ.items():
        if not key.startswith(prefix):
            continue
        parts = [p.lower() for p in key[len(prefix):].split("__") if p]
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return out


def _set_dotted(tree: dict[str, Any], dotted: str, value: Any) -> None:
    parts = dotted.split(".")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def load_config(
    yaml_path: str | Path | None = None,
    overrides: Mapping[str, Any] | None = None,
    environ: Mapping[str, str] | None = None,
) -> Config:
    """Load a Config: defaults ← YAML ← env (ARAG__*) ← dotted overrides.

    ``overrides`` keys are dotted paths, e.g. ``{"embedding.batch_size": 256}``.
    """
    tree: dict[str, Any] = {}
    if yaml_path is not None:
        loaded = yaml.safe_load(Path(yaml_path).read_text()) or {}
        if not isinstance(loaded, dict):
            raise TypeError(f"{yaml_path} must contain a mapping")
        tree = _merge(tree, loaded)
    tree = _merge(tree, _env_overrides(environ if environ is not None else os.environ))
    if overrides:
        extra: dict[str, Any] = {}
        for dotted, value in overrides.items():
            _set_dotted(extra, dotted, value)
        tree = _merge(tree, extra)
    return _build(Config, tree, "")


def save_config(cfg: Config, path: str | Path) -> None:
    Path(path).write_text(yaml.safe_dump(cfg.to_dict(), sort_keys=False))
