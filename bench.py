"""Benchmark: HTM-Align overlap-seq alignment-inference throughput per chip.

Metric: video frames (1 fps feature timesteps) aligned per second per chip,
running the full E6D6 TemporalAligner overlap-seq protocol (the reference's
headline inference path, eval/eval_zeroshot_align.py:127-205) end-to-end on
synthetic HTM-like videos: 64 s windows at stride 16, per-window active-text
selection, batched/padded window inference, canvas stitching, metric math.

vs_baseline compares against the reference pipeline's estimated throughput on
an A100 with PyTorch (BASELINE.json north star: >=5x per-chip). The reference
runs one window per forward at batch 1 through two 6-layer towers in
sequential python; at a measured-class ~15 ms/window on A100 and 16 new
frames per window, that is ~1.07k frames/s. REFERENCE_A100_FPS encodes that
estimate; the driver's recorded value is OUR measured throughput either way.
"""

import json
import time

import numpy as np

REFERENCE_A100_FPS = 1067.0  # see module docstring; estimate, not measured here


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/exoground_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from exoground_tpu.evals import AlignEvalConfig, FusedAlignEvaluator
    from exoground_tpu.models import TemporalAligner

    rng = np.random.RandomState(0)

    def make_item(seed, vlen):
        r = np.random.RandomState(seed)
        num_text = max(8, int(vlen / 12))
        aligned = (r.rand(num_text) > 0.5).astype(np.int64)
        aligned[0], aligned[1] = 1, 0
        centers = np.sort(r.rand(num_text)) * (vlen - 10) + 5
        start = np.maximum(centers - r.randint(2, 8, num_text), 0.0)
        end = np.minimum(centers + r.randint(2, 8, num_text), vlen)
        return {
            "video": r.randn(vlen, 1024).astype(np.float32),  # S3D features
            "start": start,
            "end": end,
            "aligned": aligned,
            "text_embed": r.randn(num_text, 512).astype(np.float32),  # word2vec pooler
            "vid": f"bench{seed}",
        }

    # HTM-Align-like eval set: long instructional videos (the real set's mean
    # length is ~370 s over 80 videos; use 8 x ~600 s for a stable measurement)
    items = [make_item(s, vlen) for s, vlen in enumerate([520, 640, 580, 700, 610, 560, 660, 590])]
    total_frames = sum(it["video"].shape[0] for it in items)

    model = TemporalAligner(num_encoder_layers=6, num_joint_layers=6)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 8, 1024)), jnp.zeros((1, 2, 512)),
        jnp.zeros((1, 8), bool), jnp.zeros((1, 2), bool),
    )
    cfg = AlignEvalConfig(global_len_bucket=256, text_bucket=32, transfer_dtype="float16", group_videos=4)
    evaluator = FusedAlignEvaluator(model, params, cfg)

    # warmup: compile all (Vmax, Wmax, Npad, Ntot) buckets
    evaluator(items)

    # median over reps: the device tunnel has transient congestion, and a
    # single slow rep shouldn't misrepresent steady-state throughput
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        metrics = evaluator(items)
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]

    fps = total_frames / dt
    print(
        json.dumps(
            {
                "metric": "htm_align_overlap_seq_throughput",
                "value": round(fps, 1),
                "unit": "frames_aligned_per_sec_per_chip",
                "vs_baseline": round(fps / REFERENCE_A100_FPS, 2),
            }
        )
    )
    return metrics


if __name__ == "__main__":
    main()
