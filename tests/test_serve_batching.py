"""Micro-batching in the serve layer: concurrent requests coalesce into
batched engine calls; every request gets exactly its own results back;
param groups never mix; per-group failures don't poison other groups."""

import json
import threading
import time
import urllib.request

import pytest

from arxiv_rag_tpu.search.engine import SearchResult
from arxiv_rag_tpu.serve import MicroBatcher, serve_in_thread


class FakeEngine:
    """Echoes each query back as a SearchResult; records call shapes."""

    def __init__(self, delay=0.0):
        self.calls: list[tuple[int, int, tuple | None, object]] = []
        self.delay = delay

    def search(self, queries, k=10, categories=None, hybrid_alpha=None):
        self.calls.append(
            (len(queries), k,
             None if categories is None else tuple(categories), hybrid_alpha)
        )
        if self.delay:
            time.sleep(self.delay)
        if any(q == "BOOM" for q in queries):
            raise RuntimeError("engine exploded")
        return [
            [SearchResult(row=i, score=1.0, chunk_id=q, text=f"echo:{q}")]
            for i, q in enumerate(queries)
        ]


def test_batcher_coalesces_and_routes():
    eng = FakeEngine(delay=0.02)
    b = MicroBatcher(eng, max_batch=64, batch_window_ms=20.0)
    results = {}

    def client(i):
        out = b.search([f"q{i}"], 10, None, None)
        results[i] = out[0][0].chunk_id

    threads = [threading.Thread(target=client, args=(i,)) for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    b.close()
    # every request got ITS OWN query back
    assert results == {i: f"q{i}" for i in range(16)}
    # and the engine saw fewer, larger calls (not 16 x 1)
    assert len(eng.calls) < 16
    assert max(c[0] for c in eng.calls) > 1


def test_batcher_groups_by_params():
    eng = FakeEngine()
    b = MicroBatcher(eng, max_batch=64, batch_window_ms=15.0)
    outs = {}

    def client(i, k, cats):
        outs[i] = b.search([f"q{i}"], k, cats, None)[0][0].chunk_id

    threads = [
        threading.Thread(target=client, args=(i, 5 if i % 2 else 7,
                                              ["cs.LG"] if i < 4 else None))
        for i in range(8)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    b.close()
    assert outs == {i: f"q{i}" for i in range(8)}
    # no engine call mixed ks or categories
    for n, k, cats, alpha in eng.calls:
        assert k in (5, 7)
    keys = {(k, cats) for _, k, cats, _ in eng.calls}
    assert len(keys) >= 3  # the distinct (k, cats) combos stayed separate


def test_batcher_group_failure_is_isolated():
    eng = FakeEngine()
    b = MicroBatcher(eng, max_batch=64, batch_window_ms=15.0)
    errs, oks = [], []

    def bad():
        try:
            b.search(["BOOM"], 3, None, None)
        except RuntimeError as exc:
            errs.append(str(exc))

    def good():
        oks.append(b.search(["fine"], 4, None, None)[0][0].chunk_id)

    ts = [threading.Thread(target=bad), threading.Thread(target=good)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=30)
    b.close()
    assert errs == ["engine exploded"]
    assert oks == ["fine"]  # different (k) group: unaffected


class FakePipelinedEngine(FakeEngine):
    """Engine exposing the dispatch/finish split the real engine has;
    records when dispatch vs finish ran to prove the overlap path."""

    def __init__(self, delay=0.0):
        super().__init__(delay)
        self.phases: list[str] = []

    def search_dispatch(self, queries, k=10, categories=None, hybrid_alpha=None):
        self.phases.append("dispatch")
        if any(q == "DISPATCH-BOOM" for q in queries):
            raise RuntimeError("dispatch exploded")

        def finish():
            self.phases.append("finish")
            return self.search(
                queries, k=k, categories=categories, hybrid_alpha=hybrid_alpha
            )

        return finish


def test_batcher_uses_pipelined_dispatch():
    eng = FakePipelinedEngine(delay=0.01)
    b = MicroBatcher(eng, max_batch=64, batch_window_ms=15.0)
    outs = {}

    def client(i):
        outs[i] = b.search([f"q{i}"], 10, None, None)[0][0].chunk_id

    threads = [threading.Thread(target=client, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    b.close()
    assert outs == {i: f"q{i}" for i in range(8)}
    assert "dispatch" in eng.phases and "finish" in eng.phases


def test_batcher_pipelined_errors_propagate():
    eng = FakePipelinedEngine()
    b = MicroBatcher(eng, max_batch=64, batch_window_ms=10.0)
    # error raised at DISPATCH time (loop thread)
    with pytest.raises(RuntimeError, match="dispatch exploded"):
        b.search(["DISPATCH-BOOM"], 3, None, None)
    # error raised at FINISH time (completion thread)
    with pytest.raises(RuntimeError, match="engine exploded"):
        b.search(["BOOM"], 3, None, None)
    # batcher still serves afterwards
    assert b.search(["ok"], 3, None, None)[0][0].chunk_id == "ok"
    b.close()


def test_run_control_runs_behind_completion_barrier():
    """The concurrency invariant /admin/reload relies on: a control fn
    executes on the dispatch thread ONLY after every previously
    dispatched window's finish() has fully completed — even when that
    finish is still running on the completion thread when the control
    is picked up."""
    eng = FakePipelinedEngine()
    finish_running = threading.Event()
    finish_release = threading.Event()
    order: list[str] = []

    real_dispatch = eng.search_dispatch

    def slow_dispatch(queries, **kw):
        fin = real_dispatch(queries, **kw)

        def slow_finish():
            finish_running.set()
            finish_release.wait(timeout=30)
            order.append("finish")
            return fin()

        return slow_finish

    eng.search_dispatch = slow_dispatch
    b = MicroBatcher(eng, max_batch=64, batch_window_ms=5.0)
    t = threading.Thread(target=lambda: b.search(["q"], 3, None, None))
    t.start()
    finish_running.wait(timeout=30)  # window dispatched, finish in flight

    def control():
        order.append("control")
        return "swapped"

    ct = threading.Thread(
        target=lambda: order.append(("result", b.run_control(control))))
    ct.start()
    import time as _t

    _t.sleep(0.3)  # give the control every chance to (wrongly) run early
    assert "control" not in order  # still barriered behind the finish
    finish_release.set()
    ct.join(timeout=30)
    t.join(timeout=30)
    b.close()
    assert order == ["finish", "control", ("result", "swapped")]


def test_run_control_error_propagates_and_serving_continues():
    eng = FakeEngine()
    b = MicroBatcher(eng, max_batch=64, batch_window_ms=5.0)

    def bad_control():
        raise ValueError("swap refused")

    with pytest.raises(ValueError, match="swap refused"):
        b.run_control(bad_control)
    assert b.search(["ok"], 3, None, None)[0][0].chunk_id == "ok"
    b.close()


def test_batcher_preserves_empty_categories():
    """[] means 'match no category' (zero eligible rows) — collapsing
    it to None would silently drop the filter."""
    eng = FakeEngine()
    b = MicroBatcher(eng, max_batch=64, batch_window_ms=5.0)
    b.search(["q"], 10, [], None)
    b.close()
    assert eng.calls == [(1, 10, (), None)]


def test_batcher_close_resolves_queued_jobs():
    """A job enqueued around close() must error out, not hang its
    handler thread forever."""
    eng = FakeEngine(delay=0.05)
    b = MicroBatcher(eng, max_batch=64, batch_window_ms=5.0)
    outcome = {}

    def late_client():
        try:
            outcome["r"] = b.search(["late"], 10, None, None)
        except RuntimeError as exc:
            outcome["err"] = str(exc)

    t = threading.Thread(target=late_client)
    t.start()
    time.sleep(0.001)
    b.close()
    t.join(timeout=10)
    assert not t.is_alive(), "handler thread hung after close()"
    assert "r" in outcome or "batcher closed" in outcome.get("err", "")


def test_batcher_window_zero_is_direct():
    eng = FakeEngine()
    b = MicroBatcher(eng, batch_window_ms=0.0)
    out = b.search(["direct"], 10, None, None)
    assert out[0][0].chunk_id == "direct"
    assert eng.calls == [(1, 10, None, None)]
    b.close()


def test_http_serving_over_sharded_index():
    """Serving x sharding: concurrent HTTP clients against an engine
    whose index is row-sharded over the 8-device CPU mesh (the
    arag serve --shard production layout)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from arxiv_rag_tpu.embed import Embedder
    from arxiv_rag_tpu.index.store import build_index
    from arxiv_rag_tpu.models import ModelConfig, init_params
    from arxiv_rag_tpu.parallel import data_mesh
    from arxiv_rag_tpu.search.engine import SearchEngine
    from arxiv_rag_tpu.tokenize.wordpiece import WordPieceTokenizer

    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    cfg = ModelConfig(vocab_size=256, hidden_size=64, num_hidden_layers=1,
                      num_attention_heads=2, intermediate_size=128,
                      max_position_embeddings=64)
    emb = Embedder(init_params(jax.random.PRNGKey(0), cfg), cfg,
                   WordPieceTokenizer.toy(), buckets=(16, 32),
                   batch_sizes=(8, 16), compute_dtype=jnp.float32)
    texts = [f"shard doc {i} about topic {i % 4}" for i in range(24)]
    idx = build_index(emb.encode_texts(texts),
                      chunk_ids=[f"c{i}" for i in range(24)], dtype="float32")
    idx.to_device(mesh=data_mesh())
    eng = SearchEngine(idx, embedder=emb, use_pallas=False)
    httpd, _ = serve_in_thread(eng, batch_window_ms=8.0)
    host, port = httpd.server_address
    got = {}

    def client(i):
        body = json.dumps({"queries": [texts[i]], "k": 3}).encode()
        req = urllib.request.Request(
            f"http://{host}:{port}/search", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            got[i] = json.loads(resp.read())["results"][0][0]["row"]

    threads = [threading.Thread(target=client, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    httpd.batcher.close()
    httpd.shutdown()
    assert got == {i: i for i in range(8)}  # exact self-retrieval per shard


def test_http_concurrent_requests_batch():
    eng = FakeEngine(delay=0.01)
    httpd, thread = serve_in_thread(eng, batch_window_ms=25.0)
    host, port = httpd.server_address
    got = {}

    def client(i):
        body = json.dumps({"queries": [f"q{i}"], "k": 10}).encode()
        req = urllib.request.Request(
            f"http://{host}:{port}/search", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            got[i] = json.loads(resp.read())["results"][0][0]["chunk_id"]

    threads = [threading.Thread(target=client, args=(i,)) for i in range(12)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    httpd.batcher.close()
    httpd.shutdown()
    assert got == {i: f"q{i}" for i in range(12)}
    assert len(eng.calls) < 12, eng.calls  # HTTP requests coalesced
