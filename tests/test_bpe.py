"""BPE trainer/applier semantics (pipelines/bpe.py).

The distributed pieces are thin (one word-count exchange + a
broadcast); what needs pinning is the merge-learning and encoding
algebra — verified here against a naive recount-from-scratch twin and
a hand-computed Sennrich-style fixture."""

from __future__ import annotations

import random

import pytest

from ray_script_extract.pipelines.bpe import _EOW, encode_word, learn_bpe

SF = "/root/testdata/sf0.001"


def naive_learn_bpe(word_counts, num_merges):
    """Recount-from-scratch reference: same deterministic tie-break
    (count desc, then lexicographically smallest pair)."""
    words = {w: list(w) + [_EOW] for w in word_counts if w}
    merges = []
    for _ in range(num_merges):
        counts = {}
        for w, syms in words.items():
            f = word_counts[w]
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for w, syms in words.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == best:
                    out.append(syms[j] + syms[j + 1])
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[w] = out
    return merges


def test_sennrich_fixture():
    """The classic ACL'16 toy corpus: 'es' then 'est' then 'est</w>'
    lead the merge order (newest+widest dominate)."""
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = learn_bpe(wc, 4)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", _EOW)
    assert merges == naive_learn_bpe(wc, 4)


def test_incremental_equals_naive_randomized():
    rng = random.Random(7)
    alphabet = "abcdef"
    for trial in range(20):
        wc = {}
        for _ in range(rng.randint(3, 25)):
            w = "".join(rng.choice(alphabet)
                        for _ in range(rng.randint(1, 8)))
            wc[w] = rng.randint(1, 9)
        n = rng.randint(1, 12)
        assert learn_bpe(dict(wc), n) == naive_learn_bpe(wc, n), \
            f"trial {trial}: {wc}"


def test_encode_round_trip_and_replay():
    """Encoding must (a) reconstruct the word when tokens are joined,
    and (b) equal the training-time segmentation for trained words
    (lowest-rank-first encode == replaying merges in order)."""
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "newer": 4}
    merges = learn_bpe(dict(wc), 8)
    ranks = {p: i for i, p in enumerate(merges)}

    # replay merges in training order over every word
    replay = {w: list(w) + [_EOW] for w in wc}
    for p in merges:
        for w, syms in replay.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == p:
                    out.append(syms[j] + syms[j + 1])
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            replay[w] = out

    for w in wc:
        toks = encode_word(w, ranks)
        assert "".join(toks).replace(_EOW, "") == w
        assert toks == replay[w]
    # unseen word still round-trips (falls back toward characters)
    toks = encode_word("zzlowzz", ranks)
    assert "".join(toks).replace(_EOW, "") == "zzlowzz"


def test_empty_and_degenerate():
    assert learn_bpe({}, 5) == []
    assert learn_bpe({"": 3}, 5) == []
    # single-char word: only pair is (c, </w>)
    assert learn_bpe({"a": 2}, 5) == [("a", _EOW)]
    assert encode_word("a", {("a", _EOW): 0}) == ["a" + _EOW]


@pytest.mark.usefixtures("ray_session")
def test_bpe_queries_end_to_end():
    import pandas as pd

    from ray_script_extract.pipelines.bpe import (bpe_token_counts,
                                                  bpe_train_merges)

    merges = bpe_train_merges(SF, num_merges=64)
    assert list(merges.columns) == ["rank", "left", "right", "merged"]
    assert len(merges) == 64
    assert (merges["merged"] == merges["left"] + merges["right"]).all()

    counts = bpe_token_counts(SF, num_merges=64)
    df = counts if isinstance(counts, pd.DataFrame) else counts.to_pandas()
    assert len(df) > 0 and (df["n_bpe_tokens"] > 0).all()
    # BPE with merges must not exceed pure character+EOW token count
    import pyarrow.parquet as pq
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    docs = docs.sort_values("doc_id").reset_index(drop=True)
    joined = df.sort_values("doc_id").reset_index(drop=True)
    assert (joined["doc_id"] == docs["doc_id"]).all()
    # spot-check 5 docs against a direct per-word encode
    from ray_script_extract.pipelines.bpe import encode_word as enc
    ranks = {(l, r): int(k) for k, l, r in zip(
        merges["rank"], merges["left"], merges["right"])}
    for i in range(0, min(len(docs), 50), 10):
        words = [w for w in docs.loc[i, "text"].lower().split() if w]
        expect = sum(len(enc(w, ranks)) for w in words)
        assert int(joined.loc[i, "n_bpe_tokens"]) == expect


@pytest.mark.usefixtures("ray_session")
def test_word_table_mg_cap_engages(tmp_path, caplog):
    """On a crafted high-vocabulary corpus the per-batch Misra–Gries
    cap engages (logged, never silent), memory/exchange stay bounded
    by the capacity, and the hot words still dominate the table with
    lower-bound counts (VERDICT r4 #5)."""
    import logging

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ray_script_extract.pipelines.bpe import _word_count_table

    rare = [f"rare{i:05d}" for i in range(3000)]
    hot = "alpha beta gamma delta zeta"
    texts = [" ".join(rare[i:i + 10]) + (" " + hot) * 20
             for i in range(0, 3000, 10)]
    pq.write_table(
        pa.table({"doc_id": [f"d{i}" for i in range(len(texts))],
                  "text": texts}),
        str(tmp_path / "documents.parquet"))

    with caplog.at_level(logging.WARNING,
                         logger="ray_script_extract.pipelines.bpe"):
        wc = _word_count_table(str(tmp_path), top_words=64, min_freq=1,
                               mg_capacity=256)
    assert any("MG compression engaged" in r.message
               for r in caplog.records)
    assert len(wc) <= 64
    # hot words (true count 6000 each ≫ the decrement mass) survive at
    # the top; counts are lower bounds ≤ true
    head = wc.head(5)
    assert set(head["word"]) == {"alpha", "beta", "gamma", "delta", "zeta"}
    assert (head["cnt"] <= 6000).all() and (head["cnt"] >= 5000).all()


@pytest.mark.usefixtures("ray_session")
def test_word_table_truncation_warns_only_when_truncated(tmp_path, caplog):
    """The truncation warning fires against the PRE-truncation
    distinct count: a dict landing exactly on top_words stays silent,
    a larger one warns (ADVICE r4)."""
    import logging

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ray_script_extract.pipelines.bpe import _word_count_table

    words = [f"w{i}" for i in range(8)]
    pq.write_table(
        pa.table({"doc_id": ["d0"], "text": [" ".join(words)]}),
        str(tmp_path / "documents.parquet"))

    with caplog.at_level(logging.WARNING,
                         logger="ray_script_extract.pipelines.bpe"):
        wc = _word_count_table(str(tmp_path), top_words=8, min_freq=1)
    assert len(wc) == 8
    assert not any("truncated" in r.message for r in caplog.records)

    with caplog.at_level(logging.WARNING,
                         logger="ray_script_extract.pipelines.bpe"):
        wc = _word_count_table(str(tmp_path), top_words=5, min_freq=1)
    assert len(wc) == 5
    assert any("truncated to top 5 of 8" in r.message
               for r in caplog.records)
