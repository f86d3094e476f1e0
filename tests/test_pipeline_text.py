"""Tests for the CPU text pipeline: clean / sections / citations /
metadata / formulas / chunkers (reference contracts in SURVEY §2
#11-12, #6)."""

import numpy as np

from arxiv_rag_tpu.pipeline.chunk import Chunker, ChunkerConfig, split_sentences
from arxiv_rag_tpu.pipeline.citations import extract_citations, parse_reference_entries
from arxiv_rag_tpu.pipeline.clean import TextCleaner, dehyphenate, fix_ligatures
from arxiv_rag_tpu.pipeline.formulas import (
    detect_formulas,
    improve_formula_formatting,
    protect_formulas,
    restore_formulas,
)
from arxiv_rag_tpu.pipeline.metadata import extract_metadata
from arxiv_rag_tpu.pipeline.sections import extract_sections, normalize_section_name

PAPER = """Attention Is Not All You Need For Retrieval

Jane Smith, Bob Jones
jane@uni.edu

Abstract

We study dense retrieval at corpus scale [1]. Our method improves
recall by 12% over strong baselines [2, 3]. arXiv:2401.12345v1

1 Introduction

Dense retrieval maps queries and documents into a shared vector
space (Smith et al., 2023). Prior work [1-3] has shown that scale
matters. We build on this observation.

2 Method

Our encoder f(x) produces embeddings e = f(x) with ||e|| = 1.

3 Experiments

We evaluate on standard benchmarks. See https://example.com/code
for the implementation. DOI: 10.1234/abcd.5678

References

[1] A. Author. Dense passage retrieval. arXiv:2004.04906, 2020.
[2] B. Writer. Sentence embeddings using siamese networks. In EMNLP, 2019.
[3] C. Coder. Billion-scale similarity search. IEEE TPAMI, 2019.
"""


def test_clean_removes_arxiv_header_and_controls():
    cleaner = TextCleaner()
    dirty = "arXiv:2401.12345v2 [cs.LG] 15 Jan 2024\nReal \x00content\x07 here.\n\n\n\nMore."
    out = cleaner.clean(dirty)
    assert "arXiv:2401" not in out
    assert "\x00" not in out and "\x07" not in out
    assert "Real content here." in out
    assert "\n\n\n" not in out


def test_dehyphenate_and_ligatures():
    assert dehyphenate("informa-\ntion retrieval") == "information retrieval"
    assert dehyphenate("informa- \n tion") == "information"
    assert fix_ligatures("eﬃcient ﬁne ﬂow") == "efficient fine flow"


def test_polish_extracted_text():
    from arxiv_rag_tpu.pipeline.clean import polish_extracted_text as p

    # broken URLs/emails (dot/@ spaced on both sides)
    assert p("user @ example . com") == "user@example.com"
    # prose periods (space only after) are untouched
    assert p("the end. Next sentence") == "the end. Next sentence"
    # spaced sentence periods stay sentences: capitalized continuation
    # and newline separators are boundaries, not split URLs (round-2
    # advisor finding: \s+ glued "end .\nNext" into "end.Next")
    assert p("the end . Next sentence") == "the end . Next sentence"
    assert p("the end .\nnext line") == "the end .\nnext line"
    # citations, cross-line references, abbreviations
    assert p("as shown in [ 12 ] and [3 ]") == "as shown in [12] and [3]"
    assert p("see Figure\n 3 and Table\n2") == "see Figure 3 and Table 2"
    assert p("i. e. the best, e. g. this") == "i.e. the best, e.g. this"
    # numerics
    assert p("3 . 14 and 95 %") == "3.14 and 95%"
    # adjacent independent numbers must NOT merge (the reference's
    # digit-group pass corrupted prose like this; deliberately skipped)
    assert p("In 2014 500 participants") == "In 2014 500 participants"
    # spacing inside brackets, latex commands, bullets
    assert p("( x ) and [ y ]") == "(x) and [y]"
    assert p("\\ alpha + \\ {") == "\\alpha + \\{"
    assert p("• first\n• second") == "- first\n- second"
    # sub/superscripts and version tags
    assert p("x _ i and y ^ 2 at v 2") == "x_i and y^2 at v2"
    # html entities
    assert p("a &amp; b &lt; c") == "a & b < c"


def test_cleaner_runs_polish_with_formulas_protected():
    cleaner = TextCleaner()
    out = cleaner.clean("Results [ 7 ] show informa-\ntion gain.\n\n"
                        "$E = mc^2$ stays intact.")
    assert "[7]" in out
    assert "information gain" in out
    assert "$E = mc^2$" in out  # math untouched by the polish passes
    no_polish = TextCleaner(polish=False).clean("Results [ 7 ] show it.")
    assert "[ 7 ]" in no_polish


def test_sections_extraction_and_mapping():
    smap = extract_sections(PAPER)
    names = [s.name for s in smap.sections]
    assert "abstract" in names
    assert "introduction" in names
    assert "method" in names or "methods" in names
    assert "experiments" in names
    assert "references" in names
    intro = next(s for s in smap.sections if s.name == "introduction")
    assert smap.section_at(intro.start_char + 10) == "introduction"
    # offsets are exact
    assert PAPER[intro.start_char:].startswith("1 Introduction")


def test_normalize_section_name():
    assert normalize_section_name("INTRODUCTION") == "introduction"
    assert normalize_section_name("Related  Work:") == "related work"


def test_page_mapping():
    pages = [PAPER[:300], PAPER[300:700], PAPER[700:]]
    smap = extract_sections(PAPER, pages)
    assert smap.page_at(0) == 1
    assert smap.page_at(350) == 2
    assert smap.page_at(len(PAPER) - 5) == 3


def test_citations_bracket_and_author_year():
    smap = extract_sections(PAPER)
    cits = extract_citations(PAPER, smap)
    raws = [c.raw for c in cits]
    assert any("[1]" in r for r in raws)
    assert any("[2, 3]" in r for r in raws)
    keys = {k for c in cits for k in c.keys}
    assert {"1", "2", "3"} <= keys
    ay = [c for c in cits if "Smith" in c.raw]
    assert ay and ay[0].section == "introduction"
    assert all(c.context for c in cits)


def test_citation_range_expansion():
    cits = extract_citations("As shown in [1-3] and [7].")
    keys = {k for c in cits for k in c.keys}
    assert keys == {"1", "2", "3", "7"}


def test_reference_entry_parsing():
    smap = extract_sections(PAPER)
    ref = next(s for s in smap.sections if s.name == "references")
    entries = parse_reference_entries(PAPER[ref.start_char : ref.end_char])
    assert len(entries) == 3
    assert entries[0].number == 1
    assert "2004.04906" in (entries[0].arxiv_id or "") or "2020" in (entries[0].year or "")
    assert entries[2].number == 3


def test_metadata_extraction():
    md = extract_metadata(PAPER)
    assert md.title.startswith("Attention Is Not All You Need")
    assert "dense retrieval" in md.abstract.lower() or "We study" in md.abstract
    assert "jane@uni.edu" in md.emails
    assert md.doi == "10.1234/abcd.5678"
    assert md.arxiv_id == "2401.12345"
    assert any("example.com" in u for u in md.urls)


def test_formula_detection_and_protection():
    text = "The loss is $L = \\sum_i \\ell_i$ and we set x=y+1 here."
    formulas = detect_formulas(text)
    assert formulas
    protected, saved = protect_formulas(text)
    assert "$" not in protected or len(saved) == 0
    assert restore_formulas(protected, saved) == text


def test_improve_formula_formatting_idempotent():
    s = "a=b and  x  =  y"
    once = improve_formula_formatting(s)
    assert improve_formula_formatting(once) == once


# ---------------------------------------------------------------- chunkers

LONG_TEXT = " ".join(
    f"Sentence number {i} talks about retrieval systems and their design properties."
    for i in range(120)
)


def test_split_sentences_abbrev_aware():
    spans = split_sentences("We follow Smith et al. in e.g. their setup. Second sentence here.")
    texts = ["We follow Smith et al. in e.g. their setup.", "Second sentence here."]
    got = ["We follow Smith et al. in e.g. their setup. Second sentence here."[a:b].strip() for a, b in spans]
    assert got == texts


def test_fixed_chunking_contract():
    cfg = ChunkerConfig(method="fixed", target_chars=600, min_chars=100, overlap_chars=120)
    chunks = Chunker(cfg).chunk(LONG_TEXT)
    assert len(chunks) > 5
    for c in chunks:
        assert len(c.text) <= cfg.max_chars
        assert LONG_TEXT[c.start : c.end].strip() == c.text  # offsets exact
    # overlap: consecutive chunks share text
    assert chunks[1].start < chunks[0].end


def test_sentence_chunking_respects_boundaries():
    cfg = ChunkerConfig(method="sentence", target_chars=500, min_chars=50)
    chunks = Chunker(cfg).chunk(LONG_TEXT)
    assert chunks
    for c in chunks[:-1]:
        assert c.text.rstrip().endswith(".")


def test_semantic_chunking_with_fake_encoder():
    # two topics -> orthogonal embeddings -> boundary between them
    topic_a = " ".join(f"Cats enjoy sleeping in warm sunny places number {i}." for i in range(12))
    topic_b = " ".join(f"Quantum error correction requires stabilizer codes number {i}." for i in range(12))
    text = topic_a + " " + topic_b

    def encoder(sents):
        out = []
        for s in sents:
            out.append([1.0, 0.0] if "Cats" in s else [0.0, 1.0])
        return np.asarray(out)

    cfg = ChunkerConfig(method="semantic", target_chars=4000, min_chars=50, max_chars=4000)
    chunks = Chunker(cfg, sentence_encoder=encoder).chunk(text)
    assert len(chunks) >= 2
    assert "Cats" in chunks[0].text and "Quantum" not in chunks[0].text


def test_semantic_fallback_to_fixed():
    cfg = ChunkerConfig(method="semantic")
    chunks = Chunker(cfg, sentence_encoder=None).chunk(LONG_TEXT)  # no encoder -> fallback
    assert chunks  # fell back to fixed without raising


def test_chunker_golden_stability():
    """Freeze fixed-chunker output on a fixed input (SURVEY §4a golden
    strategy): silent behavior drift in boundaries/overlap fails here."""
    import hashlib

    cfg = ChunkerConfig(method="fixed", target_chars=400, min_chars=80,
                        overlap_chars=100)
    chunks = Chunker(cfg).chunk(LONG_TEXT)
    fingerprint = hashlib.sha1(
        "|".join(f"{c.start}:{c.end}" for c in chunks).encode()
    ).hexdigest()[:16]
    from _golden import get_json

    golden = get_json("chunker_fixed_spans", lambda: {
        "fingerprint": fingerprint, "n": len(chunks),
        "first": chunks[0].text[:60], "last": chunks[-1].text[-60:],
    })
    assert golden["fingerprint"] == fingerprint
    assert golden["n"] == len(chunks)


def test_crossref_resolution():
    from arxiv_rag_tpu.pipeline.crossref import extract_crossrefs

    text = (
        "1 Introduction\n"
        "We outline the approach. Details are in Section 2 and results in "
        "Figure 1. See also Table 2 and Equation (3).\n"
        "2 Method\n"
        "The method uses a fused kernel.\n"
        "Figure 1: Architecture diagram of the system.\n"
        "Table 2: Benchmark results across systems.\n"
        "As shown in Fig. 1, the pipeline has three stages. "
        "Section 9 does not exist.\n"
    )
    smap = extract_sections(text)
    table = extract_crossrefs(text, smap)
    kinds = table.by_kind()
    assert kinds["section"] >= 2
    assert kinds["figure"] >= 2
    sec2 = next(r for r in table.refs if r.kind == "section" and r.label == "2")
    assert sec2.resolved
    assert text[sec2.target_offset:].startswith("2 Method")
    fig1 = next(r for r in table.refs if r.kind == "figure" and r.label == "1")
    assert fig1.resolved
    assert text[fig1.target_offset:].startswith("Figure 1:")
    # abbreviated mention also resolves
    figab = [r for r in table.refs if r.kind == "figure"]
    assert all(r.resolved for r in figab)
    ghost = next(r for r in table.refs if r.label == "9")
    assert not ghost.resolved
    assert table.resolved_count >= 4
