"""SmartCache / MemoryManager / ProgressReporter / StreamingExtractor."""

import io
import json

from pdfgen import simple_text_pdf
from arxiv_rag_tpu.pipeline.extract.streaming import StreamingExtractor
from arxiv_rag_tpu.utils import MemoryManager, ProgressReporter, SmartCache


def test_cache_roundtrip_and_stats():
    c = SmartCache(max_bytes=10_000_000)
    key = SmartCache.key_for("doc-content")
    assert c.get(key) is None
    c.put(key, {"pages": ["a", "b"], "score": 0.9})
    assert c.get(key)["score"] == 0.9
    s = c.stats_dict()
    assert s["hits"] == 1 and s["misses"] == 1 and s["entries"] == 1


def test_cache_lru_eviction():
    import os

    c = SmartCache(max_bytes=3000)
    for i in range(50):
        c.put(f"k{i}", os.urandom(500))  # incompressible
    assert c.stats.evictions > 0
    assert c.stats.stored_bytes <= 3000
    assert c.get("k0") is None  # oldest evicted
    assert c.get("k49") is not None


def test_cache_ttl_expiry(monkeypatch):
    import time as _time

    c = SmartCache(ttl_seconds=10)
    c.put("k", "v")
    real = _time.time()
    monkeypatch.setattr("arxiv_rag_tpu.utils.cache.time.time", lambda: real + 100)
    assert c.get("k") is None
    assert c.stats.expirations == 1


def test_cache_disk_persistence(tmp_path):
    c1 = SmartCache(directory=tmp_path)
    c1.put("k", [1, 2, 3])
    c2 = SmartCache(directory=tmp_path)  # fresh memory, same disk
    assert c2.get("k") == [1, 2, 3]
    assert c2.warmup() >= 1


def test_metrics_timer_percentiles_and_bounded_window():
    from arxiv_rag_tpu.logging_utils import Metrics

    m = Metrics()
    for i in range(100):
        m.observe("t", i / 100.0)
    snap = m.snapshot()["timers"]["t"]
    assert snap["count"] == 100
    assert abs(snap["mean_s"] - 0.495) < 1e-9
    assert snap["max_s"] == 0.99
    assert 0.45 <= snap["p50_s"] <= 0.55
    assert 0.90 <= snap["p95_s"] <= 0.99
    # the sample window is bounded; aggregates keep the full history
    for i in range(Metrics.TIMER_WINDOW + 500):
        m.observe("t", 0.001)
    t = m.timers["t"]
    assert len(t["recent"]) == Metrics.TIMER_WINDOW
    assert t["count"] == 100 + Metrics.TIMER_WINDOW + 500


def test_memory_manager_batching():
    mm = MemoryManager(min_batch=2, max_batch=16)
    snap = mm.snapshot()
    assert snap.level in ("ok", "elevated", "critical")
    assert 2 <= mm.recommended_batch(item_bytes=1 << 30) <= 16
    calls = []
    out = mm.process_memory_aware(list(range(40)), lambda b: [x * 2 for x in calls.append(len(b)) or b])
    assert out == [x * 2 for x in range(40)]
    assert sum(calls) == 40


def test_progress_reporter_sinks():
    buf = io.StringIO()
    seen = []
    p = ProgressReporter(100, every=10, sink="json", stream=buf, callback=seen.append, phase="x")
    for _ in range(30):
        p.update()
    state = p.finish()
    assert state.done == 30
    lines = [json.loads(l) for l in buf.getvalue().splitlines()]
    assert lines[-1]["done"] == 30 and lines[-1]["phase"] == "x"
    assert seen and seen[-1].rate > 0
    p2 = p.new_phase("y", 5)
    assert p2.state.phase == "y" and p2.state.total == 5


def test_streaming_extractor_checkpoint_resume(tmp_path):
    pages = [f"Page {i} body text with several words in it." for i in range(7)]
    pdf = tmp_path / "doc.pdf"
    pdf.write_bytes(simple_text_pdf(pages))
    se = StreamingExtractor(checkpoint_dir=tmp_path / "ck", checkpoint_every=2)

    # interrupt after 4 pages
    seen = []
    for prog in se.stream_pages(pdf):
        seen.append(prog.page)
        if prog.page == 4:
            break
    ckpts = list((tmp_path / "ck").glob("*.ckpt.json"))
    assert len(ckpts) == 1
    assert json.loads(ckpts[0].read_text())["last_page"] == 4

    # resume: checkpointed pages replay (so collectors see the full
    # document), extraction continues at page 5, checkpoint removed
    rest = [p.page for p in se.stream_pages(pdf)]
    assert rest == [1, 2, 3, 4, 5, 6, 7]
    assert not list((tmp_path / "ck").glob("*.ckpt.json"))

    texts = se.extract_all(pdf)
    assert len(texts) == 7
    assert "Page 6" in texts[6]
    assert "Page 0" in texts[0]  # replayed pages carry their text
