"""corpus_vocab_bottomk must equal sorted(corpus_vocab)[:k] exactly — the
flagship setup's alias picks depend on it bit-for-bit (VERDICT r3 item #2:
O(k) driver state replacing the full-vocabulary collect)."""

SF = "/root/testdata/sf0.001"


def test_bottomk_matches_full_sorted_prefix(ray_session):
    from ahrd_ray.sources.tables import corpus_vocab, corpus_vocab_bottomk

    full = corpus_vocab(SF)
    assert corpus_vocab_bottomk(SF, 311) == full[:311]
    assert corpus_vocab_bottomk(SF, 5) == full[:5]
    # sub-k corpus: len(result) = |vocab| so the r < len(vocab) guard in
    # build_catalog behaves identically
    assert corpus_vocab_bottomk(SF, 10_000) == full
