"""Protocol parity for the curriculum sampler, phase schedule, and word2vec
tokenizer.

Runs the reference's ACTUAL classes — ``CurriculumDistributedSampler`` and
``get_phase`` imported from /root/reference/train/main_egoexo4d_distributed.py
(:37-103) and ``Word2VecTokenizer`` from model/word2vec_model.py:26-73 — on
identical inputs against data/sampling.py and models/word2vec.py.

Sampler sequences are compared exactly with shuffle off (the curriculum-size
formula, wraparound padding to total_size and rank striding are the protocol;
the shuffle RNG is torch-specific and ours is numpy by design — under shuffle
we instead assert the structural invariants both must share)."""

import os
import sys

import numpy as np
import pytest

REF_ROOT = "/root/reference"

pytestmark = [
    pytest.mark.slow,  # integration tier: run with -m slow
    pytest.mark.skipif(not os.path.isdir(os.path.join(REF_ROOT, "train")),
                       reason="reference not mounted"),
]


@pytest.fixture(scope="module")
def ref_mod():
    from tests._oracle_utils import stub_missing_modules

    stub_missing_modules()
    for p in (REF_ROOT, os.path.join(REF_ROOT, "train"),
              os.path.join(REF_ROOT, "model")):
        if p not in sys.path:
            sys.path.insert(0, p)
    import main_egoexo4d_distributed as m

    return m


@pytest.mark.parametrize("n,shards", [(37, 4), (40, 4), (16, 1), (23, 8)])
@pytest.mark.parametrize("start_frac,end_frac,max_epochs",
                         [(0.5, 0.75, 10), (0.3, 0.5, 8), (0.5, 1.0, 6)])
def test_curriculum_sampler_sequences_match_reference(
    ref_mod, n, shards, start_frac, end_frac, max_epochs
):
    from exoground_tpu.data.sampling import CurriculumShardedSampler

    for epoch in range(max_epochs):
        for rank in range(shards):
            ref = ref_mod.CurriculumDistributedSampler(
                list(range(n)), num_replicas=shards, rank=rank,
                shuffle=False, max_epochs=max_epochs,
                start_frac=start_frac, end_epoch_frac=end_frac,
            )
            ref.set_epoch(epoch)
            ours = CurriculumShardedSampler(
                n, num_shards=shards, shard=rank, shuffle=False,
                max_epochs=max_epochs, start_frac=start_frac,
                end_epoch_frac=end_frac,
            )
            ours.set_epoch(epoch)
            assert list(ours) == list(ref), (
                f"n={n} shards={shards} rank={rank} epoch={epoch} "
                f"start={start_frac} end={end_frac}"
            )
            assert len(ours) == ref.num_samples


def test_curriculum_sampler_shuffle_invariants(ref_mod):
    """Under shuffle the RNGs differ by design (torch randperm vs numpy
    permutation); the shared structural contract: per-rank length equals the
    reference's num_samples, and the union of ranks covers exactly the
    curriculum subset {0..num-1}."""
    from exoground_tpu.data.sampling import CurriculumShardedSampler

    n, shards, max_epochs = 53, 4, 10
    for epoch in (0, 4, 9):
        ref_union, our_union = [], []
        for rank in range(shards):
            ref = ref_mod.CurriculumDistributedSampler(
                list(range(n)), num_replicas=shards, rank=rank,
                shuffle=True, max_epochs=max_epochs,
            )
            ref.set_epoch(epoch)
            ours = CurriculumShardedSampler(
                n, num_shards=shards, shard=rank, shuffle=True,
                max_epochs=max_epochs,
            )
            ours.set_epoch(epoch)
            r, o = list(ref), list(ours)
            assert len(o) == len(r) == ref.num_samples
            ref_union += r
            our_union += o
        assert set(our_union) == set(ref_union)


def test_get_phase_matches_reference(ref_mod):
    from exoground_tpu.data.sampling import get_phase

    for total in (10, 20, 33):
        for num_phases in (2, 3, 4):
            for frac in (0.25, 0.4, 0.5):
                for epoch in range(total):
                    assert get_phase(epoch, total, num_phases, frac) == \
                        ref_mod.get_phase(epoch, total, num_phases, frac), (
                            epoch, total, num_phases, frac)


# ------------------------------------------------------ word2vec tokenizer

SENTENCES = [
    "Add the flour and mix it well",
    "Don't over-mix; it's IMPORTANT!",
    "unknownword zzz qqq",
    "  multiple   spaces\tand\nnewlines  ",
    "a " * 40 + "tail beyond max words",
    "numbers 123 and sym&bols #/@",
    "",
]


def test_word2vec_tokenizer_matches_reference(ref_mod):
    import word2vec_model as ref_w2v

    from exoground_tpu.models.word2vec import Word2VecTokenizer

    vocab = {w: i + 1 for i, w in enumerate(
        "add the flour and mix it well don't it's important tail beyond max"
        " words numbers 123 a multiple spaces newlines over".split()
    )}

    ref_tok = ref_w2v.Word2VecTokenizer.__new__(ref_w2v.Word2VecTokenizer)
    ref_tok.word_to_token = dict(vocab)
    ref_tok.token_to_word = {v: k for k, v in vocab.items()}
    ref_tok.max_words = 32
    ours = Word2VecTokenizer(dict(vocab), max_words=32)

    for s in SENTENCES:
        if not s.strip():
            continue  # reference np.array branch differs on empty input only
        r = ref_tok(s, return_tensors=None)
        # ours is always batched: a str input is a batch of one (documented
        # contract difference; the token math must be identical)
        o = ours(s)
        assert list(o["input_ids"][0]) == list(r["input_ids"]), s
        assert list(o["attention_mask"][0]) == list(r["attention_mask"]), s
        assert ours.tokenize(s) == ref_tok.tokenize(s), s

    # list input: batch tokenization
    batch = [s for s in SENTENCES if s.strip()]
    r = ref_tok(batch, return_tensors=None)
    o = ours(batch)
    assert [list(x) for x in o["input_ids"]] == [list(x) for x in r["input_ids"]]
    assert [list(x) for x in o["attention_mask"]] == [
        list(x) for x in r["attention_mask"]
    ]
