from arxiv_rag_tpu.store import ChunkRecord, CorpusReader, CorpusWriter, ProgressDB


def _mk_records(n, category="cs.LG"):
    return [
        ChunkRecord(
            paper_id=f"p{i // 3}",
            chunk_index=i % 3,
            text=f"chunk text number {i} " * 5,
            category=category,
            section="introduction",
            page=i % 7,
            quality=0.5 + 0.5 * (i % 2),
            token_count=25,
        )
        for i in range(n)
    ]


def test_write_read_roundtrip(tmp_path):
    recs = _mk_records(10)
    with CorpusWriter(tmp_path / "corpus", rows_per_shard=4) as w:
        w.add_all(recs)
    r = CorpusReader(tmp_path / "corpus")
    assert r.num_rows == 10
    assert len(r.shard_paths()) == 3  # 4+4+2
    table = r.read_all()
    assert table.num_rows == 10
    assert table.column("chunk_id").to_pylist()[0] == "p0#0"
    assert r.categories == {"cs.LG": 10}


def test_append_across_writers(tmp_path):
    d = tmp_path / "corpus"
    with CorpusWriter(d, rows_per_shard=100) as w:
        w.add_all(_mk_records(5))
    with CorpusWriter(d, rows_per_shard=100) as w:
        w.add_all(_mk_records(5, category="cs.CV"))
    r = CorpusReader(d)
    assert r.num_rows == 10
    assert r.categories == {"cs.LG": 5, "cs.CV": 5}
    offsets = [s["row_offset"] for s in r.manifest["shards"]]
    assert offsets == [0, 5]


def test_quality_filter_stream(tmp_path):
    with CorpusWriter(tmp_path / "c") as w:
        w.add_all(_mk_records(10))  # alternating 0.5 / 1.0
    r = CorpusReader(tmp_path / "c")
    texts = r.texts(min_quality=0.9)
    assert len(texts) == 5


def test_batched_iteration_with_projection(tmp_path):
    with CorpusWriter(tmp_path / "c", rows_per_shard=6) as w:
        w.add_all(_mk_records(14))
    r = CorpusReader(tmp_path / "c")
    total = 0
    for batch in r.iter_batches(batch_size=4, columns=["chunk_id", "text"]):
        assert set(batch.schema.names) == {"chunk_id", "text"}
        total += batch.num_rows
    assert total == 14


def test_progress_db_resume(tmp_path):
    with ProgressDB(tmp_path / "p.db") as db:
        db.mark_batch("extract", [("a", "done", "", ""), ("b", "failed", "", "boom")])
        db.mark("extract", "c")
        assert db.done_set("extract") == {"a", "c"}
        assert db.filter_pending("extract", ["a", "b", "c", "d"]) == ["b", "d"]
        assert db.stats("extract") == {"done": 2, "failed": 1}
    # reopen — state persists
    with ProgressDB(tmp_path / "p.db") as db:
        assert db.done_set("extract") == {"a", "c"}


def test_take_rows_random_access(tmp_path):
    recs = _mk_records(25)
    with CorpusWriter(tmp_path / "c", rows_per_shard=7) as w:
        w.add_all(recs)
    r = CorpusReader(tmp_path / "c")
    full = r.read_all(columns=["chunk_id", "text", "page"])
    rows = [24, 0, 13, 13, 7, 6, 21]  # scattered, duplicated, shard-crossing
    got = r.take_rows(rows, columns=["chunk_id", "text", "page"])
    assert got.num_rows == len(rows)
    for out_i, row in enumerate(rows):
        for col in ("chunk_id", "text", "page"):
            assert got.column(col)[out_i].as_py() == full.column(col)[row].as_py()
    # out-of-range is an error, not silent garbage
    import pytest

    with pytest.raises(IndexError):
        r.take_rows([25])
    with pytest.raises(IndexError):
        r.take_rows([-1])
    # empty request
    assert r.take_rows([], columns=["text"]).num_rows == 0


def test_take_rows_cache_bounded(tmp_path):
    recs = _mk_records(40)
    with CorpusWriter(tmp_path / "c", rows_per_shard=5) as w:
        w.add_all(recs)
    r = CorpusReader(tmp_path / "c", cache_bytes=1)  # force eviction
    for start in range(0, 40, 5):
        r.take_rows([start], columns=["text"])
    # at most one resident group under a 1-byte budget
    assert len(r._rg_cache) == 1
    big = CorpusReader(tmp_path / "c")  # default budget: all groups stay
    for start in range(0, 40, 5):
        big.take_rows([start], columns=["text"])
    assert len(big._rg_cache) == 8
    assert big._rg_cache_size == sum(t.nbytes for t in big._rg_cache.values())


def test_warm_cache_loads_every_group(tmp_path):
    recs = _mk_records(30)
    with CorpusWriter(tmp_path / "c", rows_per_shard=8) as w:
        w.add_all(recs)
    r = CorpusReader(tmp_path / "c")
    n = r.warm_cache(columns=["chunk_id", "text"])
    assert n == len(r._rg_cache) == 4  # ceil(30/8) shards, 1 group each
    # subsequent take_rows served from cache (no new entries)
    r.take_rows([0, 29, 15], columns=["chunk_id", "text"])
    assert len(r._rg_cache) == 4
