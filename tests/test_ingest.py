"""Downloader + dedup tests with a fake fetcher (no gsutil needed)."""

import json
import threading

import pytest

from arxiv_rag_tpu.ingest import Downloader, DownloaderConfig, deduplicate
from arxiv_rag_tpu.ingest.downloader import FetchError, paper_paths, parse_papers_file

PDF_BYTES = b"%PDF-1.4\nfake body\n%%EOF"


def make_fetcher(available: dict[str, bytes], fail_first: int = 0):
    """available: url suffix (e.g. '2401.00001v2.pdf') -> payload."""
    calls = {"n": 0}

    def fetch(url, dest):
        calls["n"] += 1
        if calls["n"] <= fail_first:
            raise FetchError("transient")
        name = url.rsplit("/", 1)[-1]
        if name not in available:
            raise FetchError("404")
        dest.write_bytes(available[name])

    fetch.calls = calls
    return fetch


def cfg(tmp_path, **kw):
    kw.setdefault("max_workers", 2)
    kw.setdefault("retry_base_delay", 0.0)
    return DownloaderConfig(output_dir=tmp_path / "pdfs", **kw)


def test_version_ladder_finds_v2(tmp_path):
    fetch = make_fetcher({"2401.00001v2.pdf": PDF_BYTES})
    d = Downloader(cfg(tmp_path), fetcher=fetch)
    ok, info = d.download_one("cs.LG", "2401.00001")
    assert ok and info == "v2"
    assert paper_paths(d.root, "cs.LG", "2401.00001").read_bytes() == PDF_BYTES


def test_invalid_payload_rejected(tmp_path):
    fetch = make_fetcher({"2401.00002v1.pdf": b"<html>not a pdf</html>"})
    d = Downloader(cfg(tmp_path), fetcher=fetch)
    ok, err = d.download_one("cs.LG", "2401.00002")
    assert not ok
    assert not paper_paths(d.root, "cs.LG", "2401.00002").exists()


def test_retry_then_success(tmp_path):
    fetch = make_fetcher({"2401.00003v1.pdf": PDF_BYTES}, fail_first=2)
    d = Downloader(cfg(tmp_path), fetcher=fetch)
    ok, info = d.download_one("cs.AI", "2401.00003")
    assert ok and info == "v1"


def test_batch_ledgers_and_resume(tmp_path):
    avail = {f"2401.0000{i}v1.pdf": PDF_BYTES for i in range(1, 4)}
    fetch = make_fetcher(avail)
    d = Downloader(cfg(tmp_path), fetcher=fetch)
    papers = [("cs.LG", f"2401.0000{i}") for i in range(1, 5)]  # 00004 missing
    res = d.download(papers)
    assert res.succeeded == 3 and res.failed == 1
    ok_lines = (d.root / "_successful_downloads.jsonl").read_text().splitlines()
    assert len(ok_lines) == 3
    fail = json.loads((d.root / "_failed_downloads.jsonl").read_text().splitlines()[0])
    assert fail["paper_id"] == "2401.00004"
    # resume: everything already downloaded is skipped, failed is retried
    d2 = Downloader(cfg(tmp_path), fetcher=fetch)
    res2 = d2.download(papers)
    assert res2.skipped == 3 and res2.attempted == 1
    assert (d.root / "download_state.json").exists()


def test_stop_event_halts(tmp_path):
    avail = {f"2401.{i:05d}v1.pdf": PDF_BYTES for i in range(100)}
    stop = threading.Event()
    fetch = make_fetcher(avail)

    def stopping_fetch(url, dest):
        fetch(url, dest)
        stop.set()

    d = Downloader(cfg(tmp_path, max_workers=1), fetcher=stopping_fetch, stop_event=stop)
    res = d.download([("cs.LG", f"2401.{i:05d}") for i in range(100)])
    assert res.stopped_early
    assert res.succeeded < 100


def test_parse_papers_file(tmp_path):
    f = tmp_path / "ids.txt"
    f.write_text("cs.LG|2401.00001\n# comment\n\ncs.CV|2401.00002\n")
    assert parse_papers_file(f) == [("cs.LG", "2401.00001"), ("cs.CV", "2401.00002")]


def test_dedup_keeps_alpha_first(tmp_path):
    root = tmp_path / "pdfs"
    for cat in ("cs.LG", "cs.AI", "cs.CV"):
        p = root / cat / "2401" / "2401.00001.pdf"
        p.parent.mkdir(parents=True)
        p.write_bytes(PDF_BYTES)
    (root / "_successful_downloads.jsonl").write_text(
        "\n".join(
            json.dumps({"paper_id": "2401.00001", "category": c})
            for c in ("cs.LG", "cs.AI", "cs.CV")
        )
        + "\n"
    )
    dry = deduplicate(root, execute=False)
    assert dry.duplicate_papers == 1 and dry.files_removed == 2
    assert (root / "cs.LG" / "2401" / "2401.00001.pdf").exists()  # dry run: no deletion

    real = deduplicate(root, execute=True)
    assert real.files_removed == 2
    assert (root / "cs.AI" / "2401" / "2401.00001.pdf").exists()
    assert not (root / "cs.LG" / "2401" / "2401.00001.pdf").exists()
    ledger = [json.loads(l) for l in (root / "_successful_downloads.jsonl").read_text().splitlines()]
    assert [r["category"] for r in ledger] == ["cs.AI"]


def test_per_category_metadata_jsonl(tmp_path):
    """Parity with reference save_metadata (downloader.py:130-144):
    one _metadata/{category}_papers.jsonl per category, appended on
    every successful download."""
    import json

    from arxiv_rag_tpu.ingest.downloader import Downloader, DownloaderConfig

    def fake_fetch(url, dest):
        dest.write_bytes(b"%PDF-1.4 fake body")

    d = Downloader(DownloaderConfig(output_dir=tmp_path, max_workers=2),
                   fetcher=fake_fetch)
    papers = [("cs.LG", "2301.00001"), ("cs.CV", "2301.00002"),
              ("cs.LG", "2302.00003")]
    res = d.download(papers)
    assert res.succeeded == 3
    lg = (tmp_path / "_metadata" / "cs.LG_papers.jsonl").read_text().splitlines()
    cv = (tmp_path / "_metadata" / "cs.CV_papers.jsonl").read_text().splitlines()
    assert len(lg) == 2 and len(cv) == 1
    rec = json.loads(lg[0])
    assert rec["category"] == "cs.LG"
    assert rec["year_month"] == rec["paper_id"].split(".")[0]
    assert rec["pdf_path"].endswith(".pdf")
