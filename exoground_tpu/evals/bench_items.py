"""Shared synthetic HTM-Align-like items for benchmarking.

Both bench.py (our TPU/CPU path) and tools/baseline_measure.py (the
reference's torch CPU path) build their inputs here so the two measurements
run the identical protocol: same video lengths, same text counts, same
aligned/non-aligned split, same GT spans. Only the feature dims differ per
stack (our flagship uses 1024-d S3D video + 512-d word2vec pooler text; the
reference model's projections expect 4096-d inputs,
/root/reference/model/tan_model.py:42-43).
"""

import numpy as np

# HTM-Align's real set is 80 videos of mean ~370 s; 8 x ~600 s gives a stable
# per-chip measurement without multi-minute bench runs
BENCH_VLENS = [520, 640, 580, 700, 610, 560, 660, 590]


def make_item(seed, vlen, video_dim=1024, text_dim=512):
    r = np.random.RandomState(seed)
    num_text = max(8, int(vlen / 12))
    aligned = (r.rand(num_text) > 0.5).astype(np.int64)
    aligned[0], aligned[1] = 1, 0
    centers = np.sort(r.rand(num_text)) * (vlen - 10) + 5
    start = np.maximum(centers - r.randint(2, 8, num_text), 0.0)
    end = np.minimum(centers + r.randint(2, 8, num_text), vlen)
    return {
        "video": r.randn(vlen, video_dim).astype(np.float32),
        "start": start,
        "end": end,
        "aligned": aligned,
        "text_embed": r.randn(num_text, text_dim).astype(np.float32),
        "vid": f"bench{seed}",
    }


def make_bench_items(video_dim=1024, text_dim=512, vlens=None):
    vlens = BENCH_VLENS if vlens is None else vlens
    return [
        make_item(s, vlen, video_dim=video_dim, text_dim=text_dim)
        for s, vlen in enumerate(vlens)
    ]


def make_query_batch(items, seed):
    """Same videos as ``items``, fresh texts: one serving 'request batch'
    over the bench corpus for FusedAlignEvaluator.preload_queries /
    run_queries (the q-request scanned-sweep bench row). Text counts match
    the base items so every batch shares the corpus's bucket dims."""
    r = np.random.RandomState(seed)
    out = []
    for it in items:
        vlen = it["video"].shape[0]
        num_text = it["text_embed"].shape[0]
        aligned = (r.rand(num_text) > 0.5).astype(np.int64)
        aligned[0], aligned[1] = 1, 0
        centers = np.sort(r.rand(num_text)) * (vlen - 10) + 5
        out.append(dict(
            it,
            start=np.maximum(centers - r.randint(2, 8, num_text), 0.0),
            end=np.minimum(centers + r.randint(2, 8, num_text), vlen),
            aligned=aligned,
            text_embed=r.randn(num_text, it["text_embed"].shape[1])
                        .astype(np.float32),
        ))
    return out
