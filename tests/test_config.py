from arxiv_rag_tpu.config import Config, load_config


def test_defaults_match_reference_contract():
    cfg = Config()
    # config.yaml:27-29
    assert cfg.text.min_chunk_chars == 200
    assert cfg.text.max_chunk_chars == 2000
    assert cfg.text.overlap_chars == 400
    # config.yaml:33-36
    assert cfg.chunking.target_tokens == 1024
    assert cfg.chunking.overlap_tokens == 100
    # config.yaml:43-47
    assert cfg.embedding.dim == 768
    assert cfg.embedding.normalize
    # config.yaml:62-69
    assert cfg.retrieval.top_k == 10
    assert cfg.retrieval.hybrid_alpha == 0.7
    assert cfg.retrieval.rerank_top_k == 50
    # config.yaml:72-78
    assert cfg.processing.batch_size == 2000
    assert cfg.processing.num_workers == 24


def test_yaml_env_cli_precedence(tmp_path):
    y = tmp_path / "c.yaml"
    y.write_text("embedding:\n  batch_size: 64\nretrieval:\n  top_k: 5\n")
    cfg = load_config(
        y,
        overrides={"retrieval.top_k": 7},
        environ={"ARAG__EMBEDDING__BATCH_SIZE": "128"},
    )
    assert cfg.embedding.batch_size == 128  # env beats yaml
    assert cfg.retrieval.top_k == 7  # cli beats yaml


def test_tuple_and_bool_coercion(tmp_path):
    cfg = load_config(
        None,
        environ={
            "ARAG__EMBEDDING__LENGTH_BUCKETS": "32,64",
            "ARAG__EMBEDDING__NORMALIZE": "false",
        },
    )
    assert cfg.embedding.length_buckets == (32, 64)
    assert cfg.embedding.normalize is False


def test_unknown_key_rejected(tmp_path):
    y = tmp_path / "c.yaml"
    y.write_text("embedding:\n  typo_key: 1\n")
    import pytest

    with pytest.raises(KeyError):
        load_config(y, environ={})


def test_paths_resolve():
    cfg = Config()
    assert str(cfg.paths.resolve("pdf_dir")) == "data/pdfs"


def test_default_yaml_round_trips():
    from pathlib import Path

    from arxiv_rag_tpu.config import load_config

    path = Path(__file__).parent.parent / "configs" / "default.yaml"
    cfg = load_config(path, environ={})
    assert cfg.embedding.model == "sentence-transformers/all-mpnet-base-v2"
    assert cfg.retrieval.hybrid_alpha == 0.7
    assert cfg == load_config(environ={})  # defaults in code == shipped yaml
