"""Measure the reference pipeline's alignment-inference throughput on this host.

Round-1 verdict item #4: bench.py's `vs_baseline` divided by a hardcoded
REFERENCE_A100_FPS estimate. This tool replaces the constant with recorded
measurements:

1. `reference_torch_cpu_fps` — the reference's own overlap-seq eval loop
   (/root/reference/eval/eval_zeroshot_align.py:127-205: sequential batch-1
   windows; per window one joint forward + one dual forward + one
   alignability forward, per the get_text_visual_sim closure at
   /root/reference/train/main.py:166-184), run with the reference's actual
   torch model imported from the read-only mount, on the identical synthetic
   item set bench.py uses. The text tower is skipped (its s3d_howto100m.pth
   weights are not in the mount) and precomputed text embeddings are fed
   instead — this *favors* the baseline, since the real loop also tokenizes
   and embeds text per window.
2. `ours_jax_cpu_fps` — our FusedAlignEvaluator on the same host CPU, same
   items: a framework-vs-framework anchor with hardware held constant.
3. `reference_a100_fps_derived = reference_torch_cpu_fps * A100_OVER_CPU_SCALE`
   — the published baseline anchor. The loop is sequential batch-1 inference
   of a 6-layer 512-d model over 64-token windows: latency-bound, so an A100's
   advantage over a CPU core is nowhere near its peak-FLOP ratio. Typical
   measured batch-1 small-transformer speedups vs one server core are
   ~10-30x; we grant the baseline the top of that range (30x) so the derived
   figure errs in the reference's favor.

Writes BASELINE_MEASURED.json at the repo root; bench.py prefers it over the
legacy constant. Run on the bench host:

    python -m exoground_tpu.tools.baseline_measure
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REF_ROOT = "/root/reference"
A100_OVER_CPU_SCALE = 30.0
# training at batch 16 is compute-bound, where an A100's advantage over
# host-CPU torch is far larger than the latency-bound batch-1 case; grant a
# deliberately generous x100 (A100 fp16 tensor-core peak over multi-thread
# CPU f32 GEMM throughput lands ~50-150x in practice for 512-d transformers)
A100_OVER_CPU_TRAIN_SCALE = 100.0
SEQ_LEN = 64
# parity input dims: the reference model's fixed pre-projections
# (tan_model.py:42-43); BOTH sides bench at these
VIDEO_DIM = 4096
TEXT_DIM = 4096


def _repo_root():
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _host_info():
    cpu = "unknown"
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("model name"):
                    cpu = line.split(":", 1)[1].strip()
                    break
    except OSError:
        pass
    return {"cpu": cpu, "nproc": os.cpu_count()}


def measure_reference_torch_cpu(items, seq_len=SEQ_LEN):
    """Run the reference's overlap-seq protocol with its own torch model.

    Returns frames/s over the full item set, or None if the reference mount
    (or torch) is unavailable.
    """
    if not os.path.isdir(os.path.join(REF_ROOT, "model")):
        return None
    sys.path.insert(0, os.path.join(REF_ROOT, "model"))
    sys.path.insert(0, REF_ROOT)
    try:
        import torch
        from tan_model import TemporalAligner as RefAligner
    except ImportError:
        return None
    finally:
        sys.path.pop(0)
        sys.path.pop(0)

    torch.manual_seed(0)
    model = RefAligner(
        num_encoder_layers=6,
        num_decoder_layers=6,
        use_alignability_head=1,
        random_pos_start=0,
    ).eval()

    @torch.no_grad()
    def run_item(item):
        video = torch.from_numpy(item["video"])[None]  # (1, T, 4096)
        lang = torch.from_numpy(item["text_embed"])  # (N, 4096)
        aligned = item["aligned"].astype(bool)
        mid_ts = (item["start"] + item["end"]) / 2
        vlen = video.shape[1]
        num_text = lang.shape[0]

        steps = np.arange(0, vlen - seq_len // 2, seq_len // 4)
        sim_joint = torch.zeros(num_text, vlen)
        sim_dual = torch.zeros(num_text, vlen)
        counter = torch.zeros(num_text, vlen)
        a_joint = torch.zeros(num_text)
        text_counter = torch.zeros(num_text)

        nonalignable_idx = np.arange(num_text)[~aligned]
        nonalignable_mid = mid_ts[~aligned]
        for idx, s in enumerate(steps):
            in_window = (s - seq_len <= nonalignable_mid) & (
                nonalignable_mid <= s + 2 * seq_len
            )
            active = nonalignable_idx[in_window]
            if active.size == 0:
                continue
            left, right = active.min(), active.max()
            if idx <= 3:
                left = 0
            elif idx >= len(steps) - 4:
                right = num_text
            mask = np.zeros(num_text, bool)
            mask[left : right + 1] = True
            win = video[:, s : min(vlen, s + seq_len)]
            active_lang = lang[mask][None]
            # the reference closure runs all three per window
            j = model.get_text_visual_sim_joint(win, active_lang).transpose(-1, -2)
            d = model.get_text_visual_sim_dual(win, active_lang).transpose(-1, -2)
            a = model.get_alignability(win, active_lang)
            mt = torch.from_numpy(mask)
            sim_joint[mt, s : s + win.shape[1]] += j[0, -1] / 0.07
            sim_dual[mt, s : s + win.shape[1]] += d[0, -1] / 0.07
            counter[mt, s : s + win.shape[1]] += 1
            a_joint[mt] += a["alignability-joint"][0, 2, :, 0]
            text_counter[mt] += 1

        eps = torch.tensor(1e-5)
        sim = (sim_joint + sim_dual).div(2 * torch.maximum(counter, eps))
        a_joint = a_joint.div(torch.maximum(text_counter, eps))
        sim = sim.masked_fill(sim == 0, -6e4)
        prob = sim.softmax(-1)
        recall = []
        for t in np.arange(num_text)[aligned]:
            lo = int(np.floor(item["start"][t]))
            hi = int(np.ceil(item["end"][t]))
            recall.append(lo <= int(prob[t].argmax()) <= hi)
        return recall, a_joint.numpy()

    run_item(items[0])  # warmup (allocator, thread pools)
    t0 = time.perf_counter()
    for item in items:
        run_item(item)
    dt = time.perf_counter() - t0
    total_frames = sum(it["video"].shape[0] for it in items)
    return total_frames / dt


def measure_reference_torch_cpu_train(
    b: int = 16, t: int = SEQ_LEN, n: int = 12, steps: int = 3
):
    """Measured torch-CPU anchor for the E6D6 EMA-cotrain TRAIN step
    (round-2 verdict weak-#4: the train-side claim had no measurement).

    Replicates the reference cotrain iteration (train/main.py:36-120) with
    the reference's own modules: online forward + EMA-target forward +
    get_loss (agreement + threshold 0.7 + alignability BCE, the same config
    bench.py times on our side) + backward + AdamW step + _momentum_update.
    TwinTemporalAligner itself dereferences the nonexistent
    ``self.online.bert`` (tan_model.py:317, known-broken legacy line —
    SURVEY §7), so the twin is assembled manually here: online + deep-copied
    frozen target with random_pos_start=0 (:327). f32, no autocast (CPU has
    no fp16 path; the reference trains AMP fp16 — favors us not at all since
    OUR number is bf16 vs this f32 anchor *scaled by the A100 factor*).
    Returns samples/s or None.
    """
    if not os.path.isdir(os.path.join(REF_ROOT, "model")):
        return None
    import copy
    import types

    sys.path.insert(0, os.path.join(REF_ROOT, "model"))
    sys.path.insert(0, os.path.join(REF_ROOT, "train"))
    sys.path.insert(0, REF_ROOT)
    try:
        import torch
        from tan_model import TemporalAligner as RefAligner

        from tests._oracle_utils import stub_missing_modules

        stub_missing_modules()
        import loss as ref_loss
    except ImportError:
        return None
    finally:
        sys.path.pop(0)
        sys.path.pop(0)
        sys.path.pop(0)

    torch.manual_seed(0)
    online = RefAligner(
        num_encoder_layers=6, num_decoder_layers=6, use_alignability_head=1
    ).train()
    target = copy.deepcopy(online)
    target.random_pos_start = 0
    for p_ in target.parameters():
        p_.requires_grad = False

    rng = np.random.RandomState(0)
    video = torch.from_numpy(rng.randn(b, t, VIDEO_DIM).astype(np.float32))
    text = torch.from_numpy(rng.randn(b, n, TEXT_DIM).astype(np.float32))
    vmask = torch.zeros(b, t, dtype=torch.bool)
    lmask = torch.zeros(b, n, dtype=torch.bool)
    start_np = rng.randint(0, t - 8, (b, n)).astype(np.float64)
    starts = [list(row) for row in start_np]
    ends = [list(row + 6.0) for row in start_np]
    input_data = {
        "start": starts, "end": ends,
        "text": [[f"s{i}{j}" for j in range(n)] for i in range(b)],
    }
    abs_pos = torch.from_numpy(
        np.stack([start_np / t, (start_np + 6.0) / t], axis=-1).astype(np.float32)
    )
    args = types.SimpleNamespace(
        model="cotrain", sim="cos", learn_agreement=1,
        temporal_agreement_type="keep", loss_threshold=0.7,
        use_alignability_head=1, optim_policy="default",
    )
    opt = torch.optim.AdamW(online.parameters(), lr=1e-4, weight_decay=1e-5)
    binary_tgt, _, _ = ref_loss.get_mask_from_time(
        starts, ends, num_timestamp=t, num_text=n, device=torch.device("cpu")
    )

    def one_step():
        opt.zero_grad()
        # reference forward takes no abs_text_pos (tan_model.py:94-97);
        # the loss consumes it separately (loss.py:59)
        logits = online(
            video, text, video_padding_mask=vmask, lang_padding_mask=lmask,
            text_timestamp=binary_tgt,
        )
        with torch.no_grad():
            ema = target(
                video, text, video_padding_mask=vmask, lang_padding_mask=lmask,
                text_timestamp=binary_tgt,
            )
        logits = {**logits, **{f"ema-{k}": v for k, v in ema.items()}}
        loss_dict = ref_loss.get_loss(
            input_data=input_data, video_seq=video, text_embed=text,
            video_padding_mask=vmask, text_padding_mask=lmask,
            logits=logits, args=args, abs_text_pos=abs_pos,
        )
        loss_dict["loss"].backward()
        opt.step()
        with torch.no_grad():  # _momentum_update (tan_model.py:334-338)
            for po, pt_ in zip(online.parameters(), target.parameters()):
                pt_.data = pt_.data * 0.999 + po.data * 0.001

    one_step()  # warmup
    best = float("inf")
    for _ in range(steps):
        t0 = time.perf_counter()
        one_step()
        best = min(best, time.perf_counter() - t0)
    return b / best


def _measure_ours_cpu_child():
    """Child-process body: our fused evaluator on the CPU backend."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from exoground_tpu.evals import AlignEvalConfig, FusedAlignEvaluator
    from exoground_tpu.evals.bench_items import make_bench_items
    from exoground_tpu.models import TemporalAligner

    items = make_bench_items(video_dim=VIDEO_DIM, text_dim=TEXT_DIM)
    model = TemporalAligner(num_encoder_layers=6, num_joint_layers=6)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 8, VIDEO_DIM)),
        jnp.zeros((1, 2, TEXT_DIM)),
        jnp.zeros((1, 8), bool),
        jnp.zeros((1, 2), bool),
    )
    cfg = AlignEvalConfig(
        global_len_bucket=256, text_bucket=32, transfer_dtype="float16", group_videos=4
    )
    evaluator = FusedAlignEvaluator(model, params, cfg)
    evaluator(items)  # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        evaluator(items)
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    total_frames = sum(it["video"].shape[0] for it in items)
    print(json.dumps({"ours_jax_cpu_fps": total_frames / dt}))


def measure_ours_cpu():
    """Run our evaluator on the CPU backend in a clean subprocess."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = _repo_root() + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "from exoground_tpu.tools.baseline_measure import "
            "_measure_ours_cpu_child; _measure_ours_cpu_child()",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"ours-cpu measurement failed:\n{proc.stderr[-3000:]}")
    return json.loads(proc.stdout.strip().splitlines()[-1])["ours_jax_cpu_fps"]


def main():
    from exoground_tpu.evals.bench_items import make_bench_items

    # the reference model's projections expect 4096-d inputs (tan_model.py:42-43)
    ref_items = make_bench_items(video_dim=VIDEO_DIM, text_dim=TEXT_DIM)
    print("measuring reference torch CPU ...", file=sys.stderr)
    ref_fps = measure_reference_torch_cpu(ref_items)
    print(
        "reference torch CPU: "
        + (f"{ref_fps:.1f} frames/s" if ref_fps else "unavailable"),
        file=sys.stderr,
    )
    print("measuring reference torch CPU train step ...", file=sys.stderr)
    ref_train_sps = measure_reference_torch_cpu_train()
    print(
        "reference torch CPU cotrain: "
        + (f"{ref_train_sps:.2f} samples/s" if ref_train_sps else "unavailable"),
        file=sys.stderr,
    )
    print("measuring ours (jax CPU) ...", file=sys.stderr)
    ours_cpu_fps = measure_ours_cpu()
    print(f"ours jax CPU: {ours_cpu_fps:.1f} frames/s", file=sys.stderr)

    record = {
        "host": _host_info(),
        "protocol": (
            "HTM-Align overlap-seq, 8 synthetic videos (520-700 s, 1 fps "
            "features), seq_len 64 stride 16, E6D6 TemporalAligner; per window "
            "joint+dual+alignability forwards (reference closure "
            "train/main.py:166-184); reference runs sequential batch-1 with "
            "precomputed text embeds (favors baseline: real loop also runs "
            "the text tower per window)"
        ),
        "reference_torch_cpu_fps": round(ref_fps, 2) if ref_fps else None,
        "ours_jax_cpu_fps": round(ours_cpu_fps, 2),
        "a100_over_cpu_scale": A100_OVER_CPU_SCALE,
        "a100_scale_rationale": (
            "sequential batch-1 64-token 6-layer 512-d inference is "
            "latency-bound; measured batch-1 small-transformer A100 speedups "
            "vs one server core are ~10-30x; we grant the top of the range"
        ),
        "reference_a100_fps_derived": (
            round(ref_fps * A100_OVER_CPU_SCALE, 1) if ref_fps else None
        ),
        "train_protocol": (
            "E6D6 EMA-cotrain step, batch 16, seq 64, 12 texts, 4096-d "
            "video+text, full TAN loss (agreement keep + threshold 0.7 + "
            "alignability BCE) + AdamW + momentum update; reference modules "
            "on host CPU f32 (see measure_reference_torch_cpu_train)"
        ),
        "reference_torch_cpu_train_sps": (
            round(ref_train_sps, 3) if ref_train_sps else None
        ),
        "a100_over_cpu_train_scale": A100_OVER_CPU_TRAIN_SCALE,
        "reference_a100_train_sps_derived": (
            round(ref_train_sps * A100_OVER_CPU_TRAIN_SCALE, 1)
            if ref_train_sps else None
        ),
        "torch_version": _torch_version(),
    }
    out = os.path.join(_repo_root(), "BASELINE_MEASURED.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=2)
        f.write("\n")
    print(json.dumps(record, indent=2))


def _torch_version():
    try:
        import torch

        return torch.__version__
    except Exception:
        return None


if __name__ == "__main__":
    main()
