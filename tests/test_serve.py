"""Serving layer tests: alignment/grounding services + HTTP front."""

import io
import json
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # integration tier: run with -m slow

from exoground_tpu.models import TemporalAligner
from exoground_tpu.models.grounding import ExoGroundingTransformer
from exoground_tpu.serve import (
    AlignmentService,
    AlignRequest,
    GroundingService,
    serve_http,
)


def _tan():
    model = TemporalAligner(
        num_encoder_layers=1, num_joint_layers=1, width=32, heads=4,
        max_pos=128, attn_impl="xla",
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 24)), jnp.zeros((1, 2, 16)),
        jnp.zeros((1, 8), bool), jnp.zeros((1, 2), bool),
    )
    return model, params


def test_alignment_service():
    model, params = _tan()
    svc = AlignmentService(model, params, seq_len=16, transfer_dtype="float32")
    rng = np.random.RandomState(0)
    req = AlignRequest(
        video=rng.randn(80, 24).astype(np.float32),
        text_embeds=rng.randn(5, 16).astype(np.float32),
    )
    out = svc.align(req)
    assert len(out["best_second"]) == 5
    assert all(0 <= t < 80 for t in out["best_second"])
    assert len(out["score"]) == 5
    # repeat request reuses compiled buckets (no error, stable output)
    out2 = svc.align(req)
    assert out2["best_second"] == out["best_second"]


def test_grounding_service():
    c = 24
    model = ExoGroundingTransformer(
        num_encoder_layers=1, num_decoder_layers=1,
        video_embed_dim=c, text_embed_dim=c, feature_dim=32, attn_impl="xla",
    )
    rng = np.random.RandomState(1)
    video = rng.randn(16, c).astype(np.float32)
    narr = rng.randn(3, c).astype(np.float32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, c)), jnp.zeros((1, 8, c)),
        jnp.zeros((1, 16), bool), jnp.zeros((1, 8), bool),
    )
    svc = GroundingService(model, params, seq_len=16, text_bucket=8)
    out = svc.ground(video, narr)
    assert len(out["start"]) == 3 and len(out["end"]) == 3


def test_http_front():
    model, params = _tan()
    svc = AlignmentService(model, params, seq_len=16, transfer_dtype="float32")
    server = serve_http(align_service=svc, host="127.0.0.1", port=0, block=False)
    port = server.server_address[1]
    try:
        rng = np.random.RandomState(0)
        buf = io.BytesIO()
        np.savez_compressed(
            buf,
            video=rng.randn(60, 24).astype(np.float32),
            text_embed=rng.randn(4, 16).astype(np.float32),
        )
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/align", data=buf.getvalue(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            payload = json.loads(resp.read())
        assert len(payload["best_second"]) == 4

        # unknown route -> 404 json
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/nope", data=b"x", method="POST"
        )
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()


def test_alignment_service_covers_whole_video():
    """Regression: without coarse timestamps, EVERY second must be scorable —
    a planted high-similarity segment mid-video must win the argmax."""
    model, params = _tan()
    svc = AlignmentService(model, params, seq_len=16, transfer_dtype="float32")
    rng = np.random.RandomState(3)
    video = rng.randn(160, 24).astype(np.float32) * 0.01
    text = rng.randn(1, 16).astype(np.float32)
    # find which video vector this text likes most by probing, then plant it
    # mid-video: run once to get scores over a probe video with a strong
    # pattern at t=80..88
    video[80:88] = rng.randn(1, 24).astype(np.float32) * 3.0
    out = svc.align(AlignRequest(video=video, text_embeds=text))
    # whatever the argmax is, the canvas must have REAL scores (> NEG_FILL)
    # everywhere, i.e. the mid-video region was evaluated
    assert out["score"][0] > -1e4
    # and argmax is free to land mid-video (not pinned to head/tail)
    assert 0 <= out["best_second"][0] < 160


def test_alignment_service_unsorted_timestamps_and_short_video():
    """Timestamp-protocol requests with texts in arbitrary order are sorted
    by midpoint internally and unsorted on output (the active-text protocol
    assumes chronological order); videos shorter than seq_len//2 are served
    with one covering window instead of sentinel results."""
    model, params = _tan()
    svc = AlignmentService(model, params, seq_len=16, transfer_dtype="float32")
    rng = np.random.RandomState(3)
    video = rng.randn(80, 24).astype(np.float32)
    te = rng.randn(4, 16).astype(np.float32)
    start = np.asarray([60.0, 5.0, 40.0, 20.0])
    end = start + 6.0
    out = svc.align(AlignRequest(video=video, text_embeds=te,
                                 start=start, end=end))
    order = np.argsort((start + end) / 2.0, kind="stable")
    out_sorted = svc.align(AlignRequest(
        video=video, text_embeds=te[order],
        start=start[order], end=end[order],
    ))
    # same per-text results regardless of request order
    for k in ("best_second", "score"):
        np.testing.assert_allclose(
            np.asarray(out[k])[order], out_sorted[k], rtol=1e-5
        )
    # short video: 6 frames < seq_len//2 -> single covering window
    short = svc.align(AlignRequest(
        video=rng.randn(6, 24).astype(np.float32), text_embeds=te,
    ))
    assert all(0 <= t < 6 for t in short["best_second"])
    assert all(s > -1e4 for s in short["score"])  # no NEG_FILL sentinels


def test_grounding_service_rejects_long_video_and_handles_stage_preds():
    import pytest

    c = 24
    rng = np.random.RandomState(1)
    # use_decoder=False -> per-stage (B, Stage, N, 2) interval_preds
    model = ExoGroundingTransformer(
        num_encoder_layers=1, num_decoder_layers=1, use_decoder=False,
        video_embed_dim=c, text_embed_dim=c, feature_dim=32, attn_impl="xla",
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, c)), jnp.zeros((1, 8, c)),
        jnp.zeros((1, 16), bool), jnp.zeros((1, 8), bool),
    )
    svc = GroundingService(model, params, seq_len=16, text_bucket=8)
    out = svc.ground(rng.randn(16, c).astype(np.float32),
                     rng.randn(3, c).astype(np.float32))
    assert len(out["start"]) == 3
    assert all(isinstance(v, float) for v in out["start"])  # scalars, not lists
    with pytest.raises(ValueError, match="window"):
        svc.ground(rng.randn(40, c).astype(np.float32),
                   rng.randn(3, c).astype(np.float32))


def test_alignment_service_rejects_half_specified_window():
    """start without end (or vice versa) is a protocol error with a clear
    message, not an opaque np.asarray(None) TypeError deep in align()."""
    model, params = _tan()
    svc = AlignmentService(model, params, seq_len=16, transfer_dtype="float32")
    rng = np.random.RandomState(0)
    req = AlignRequest(
        video=rng.randn(40, 24).astype(np.float32),
        text_embeds=rng.randn(3, 16).astype(np.float32),
        start=np.asarray([0.0, 5.0, 10.0]),
    )
    with pytest.raises(ValueError, match="BOTH start and end"):
        svc.align(req)


def test_alignment_service_int8_serving_mode():
    """matmul_dtype='int8' service serves the same argmaxes at these shapes
    and never mutates the process-global default context."""
    from exoground_tpu.ops import quant

    model, params = _tan()
    rng = np.random.RandomState(4)
    req = AlignRequest(
        video=rng.randn(60, 24).astype(np.float32),
        text_embeds=rng.randn(4, 16).astype(np.float32),
    )
    ref = AlignmentService(
        model, params, seq_len=16, transfer_dtype="float32"
    ).align(req)
    q = AlignmentService(
        model, params, seq_len=16, transfer_dtype="float32",
        matmul_dtype="int8",
    ).align(req)
    assert quant.current_impl() == "default"
    assert len(q["best_second"]) == 4
    # scores are quantized math (close, not equal); argmax is robust here
    assert q["best_second"] == ref["best_second"], (q, ref)
    assert q["score"] != ref["score"]
    np.testing.assert_allclose(q["score"], ref["score"], rtol=0.1)


def test_alignment_service_int8_transfer():
    """transfer_dtype='int8' (per-row absmax request upload, dequantized on
    device — bench serve_int8_p50_ms) serves the same argmaxes and
    noise-level score drift vs float32 transfer at these shapes."""
    model, params = _tan()
    rng = np.random.RandomState(6)
    req = AlignRequest(
        video=rng.randn(60, 24).astype(np.float32),
        text_embeds=rng.randn(4, 16).astype(np.float32),
    )
    ref = AlignmentService(
        model, params, seq_len=16, transfer_dtype="float32"
    ).align(req)
    q8 = AlignmentService(
        model, params, seq_len=16, transfer_dtype="int8"
    ).align(req)
    assert q8["best_second"] == ref["best_second"], (q8, ref)
    np.testing.assert_allclose(q8["score"], ref["score"], rtol=0.1)


def test_alignment_service_score_checkpoints():
    """score_checkpoints == per-checkpoint evaluator metrics; the resident
    handle is reusable across calls."""
    from exoground_tpu.evals import AlignEvalConfig, FusedAlignEvaluator

    model, params0 = _tan()
    params1 = model.init(
        jax.random.PRNGKey(7), jnp.zeros((1, 8, 24)), jnp.zeros((1, 2, 16)),
        jnp.zeros((1, 8), bool), jnp.zeros((1, 2), bool),
    )
    rng = np.random.RandomState(5)

    def item(seed, vlen):
        r = np.random.RandomState(seed)
        n = 5
        centers = np.sort(r.rand(n)) * (vlen - 6) + 3
        return {
            "video": r.randn(vlen, 24).astype(np.float32),
            "start": np.maximum(centers - 2, 0),
            "end": np.minimum(centers + 2, vlen),
            "aligned": np.array([1, 0, 1, 1, 0]),
            "text_embed": r.randn(n, 16).astype(np.float32),
        }

    items = [item(s, v) for s, v in enumerate([60, 48, 72])]
    svc = AlignmentService(model, params0, seq_len=16, transfer_dtype="float32")
    resident = svc.preload_corpus(items)
    got = svc.score_checkpoints(items, [params0, params1], resident=resident)
    got2 = svc.score_checkpoints(items, [params0, params1])  # fresh upload
    assert got == got2

    ev = FusedAlignEvaluator(model, params0, svc.cfg)
    for p, g in zip([params0, params1], got):
        ev.update_params(p)
        assert ev(items) == g, (p is params0, ev(items), g)


def test_grounding_service_int8_serving_mode():
    """matmul_dtype='int8' grounding stays close to exact math (the head is
    served unquantized) and never leaks the quant context."""
    from exoground_tpu.models.grounding import ExoGroundingTransformer
    from exoground_tpu.ops import quant

    model = ExoGroundingTransformer(
        num_encoder_layers=1, num_decoder_layers=1, feature_dim=32, heads=4,
        video_embed_dim=24, text_embed_dim=16, max_pos=64, attn_impl="xla",
        random_pos_start=0,
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 24)), jnp.zeros((1, 2, 16)),
        jnp.zeros((1, 8), bool), jnp.zeros((1, 2), bool),
    )
    rng = np.random.RandomState(6)
    video = rng.randn(12, 24).astype(np.float32)
    narr = rng.randn(3, 16).astype(np.float32)

    ref = GroundingService(model, params, seq_len=16).ground(video, narr)
    q = GroundingService(model, params, seq_len=16, matmul_dtype="int8").ground(
        video, narr
    )
    assert quant.current_impl() == "default"
    assert q != ref  # actually quantized math
    np.testing.assert_allclose(q["start"], ref["start"], atol=0.06)
    np.testing.assert_allclose(q["end"], ref["end"], atol=0.06)

    with pytest.raises(ValueError, match="matmul_dtype"):
        GroundingService(model, params, matmul_dtype="int5")


def test_alignment_service_multi_device_parity():
    """eval_devices>1 round-robins groups over the mesh with identical
    metrics/predictions to single-device serving."""
    model, params0 = _tan()
    rng = np.random.RandomState(8)

    def item(seed, vlen):
        r = np.random.RandomState(seed)
        n = 4
        centers = np.sort(r.rand(n)) * (vlen - 6) + 3
        return {
            "video": r.randn(vlen, 24).astype(np.float32),
            "start": np.maximum(centers - 2, 0),
            "end": np.minimum(centers + 2, vlen),
            "aligned": np.array([1, 0, 1, 1]),
            "text_embed": r.randn(n, 16).astype(np.float32),
        }

    # >1 group so the round-robin actually spreads (group_videos=8)
    items = [item(s, v) for s, v in enumerate([40, 56, 48] * 6)]
    svc1 = AlignmentService(model, params0, seq_len=16, transfer_dtype="float32")
    svc4 = AlignmentService(model, params0, seq_len=16, transfer_dtype="float32",
                            eval_devices=4)
    assert len(svc4._evaluator._devices) == 4  # conftest provides 8 CPU devs
    got1 = svc1.score_checkpoints(items, [params0])
    got4 = svc4.score_checkpoints(items, [params0])
    assert got1 == got4

    req = AlignRequest(
        video=np.random.RandomState(9).randn(50, 24).astype(np.float32),
        text_embeds=np.random.RandomState(10).randn(3, 16).astype(np.float32),
    )
    assert svc1.align(req) == svc4.align(req)


def test_align_batch_requests_matches_per_request_align():
    """align_batch_requests (q request batches over one corpus, one scanned
    dispatch per group) == align() per request — timestamped (active-text
    protocol with per-video midpoint sort/unsort) and all-texts modes, plus
    the preproject twin evaluator and input validation."""
    model, params = _tan()
    svc = AlignmentService(model, params, seq_len=16, transfer_dtype="float32")
    rng = np.random.RandomState(3)
    videos = [rng.randn(v, 24).astype(np.float32) for v in (60, 40, 72)]

    def tb(seed, with_ts):
        r = np.random.RandomState(seed)
        batch = []
        for video in videos:
            k, vlen = 5, video.shape[0]
            entry = {"text_embeds": r.randn(k, 16).astype(np.float32)}
            if with_ts:
                centers = r.rand(k) * (vlen - 6) + 2  # deliberately unsorted
                entry["start"] = np.maximum(centers - 2, 0)
                entry["end"] = np.minimum(centers + 2, vlen)
            batch.append(entry)
        return batch

    for with_ts in (True, False):
        batches = [tb(10 + s, with_ts) for s in range(3)]
        got = svc.align_batch_requests(videos, batches)
        assert len(got) == 3 and all(len(g) == 3 for g in got)
        for bi, batch in enumerate(batches):
            for vi, entry in enumerate(batch):
                ref = svc.align(AlignRequest(
                    video=videos[vi], text_embeds=entry["text_embeds"],
                    start=entry.get("start"), end=entry.get("end"),
                ))
                g = got[bi][vi]
                assert g["best_second"] == ref["best_second"], (with_ts, bi, vi)
                np.testing.assert_allclose(g["score"], ref["score"],
                                           atol=1e-5)
                np.testing.assert_allclose(g["align_score"],
                                           ref["align_score"], atol=1e-5)
    # preproject twin evaluator: same predictions (f32-exact here)
    batches = [tb(10 + s, True) for s in range(2)]
    plain = svc.align_batch_requests(videos, batches)
    pp = svc.align_batch_requests(videos, batches, preproject=True)
    for a, b in zip(plain, pp):
        for da, db in zip(a, b):
            assert da["best_second"] == db["best_second"]
            np.testing.assert_allclose(da["score"], db["score"], atol=1e-4)
    # validation: mixed timestamp presence / wrong batch width
    mixed = [tb(1, True), tb(2, False)]
    with pytest.raises(ValueError):
        svc.align_batch_requests(videos, mixed)
    with pytest.raises(ValueError):
        svc.align_batch_requests(videos, [tb(1, True)[:2]])


def test_http_align_batch_endpoint():
    """POST /align_batch round trip == align_batch_requests."""
    model, params = _tan()
    svc = AlignmentService(model, params, seq_len=16, transfer_dtype="float32")
    server = serve_http(align_service=svc, host="127.0.0.1", port=0, block=False)
    try:
        port = server.server_address[1]
        rng = np.random.RandomState(7)
        videos = [rng.randn(v, 24).astype(np.float32) for v in (48, 64)]
        arrays = {f"video_{j}": v for j, v in enumerate(videos)}
        batches = []
        for i in range(2):
            batch = []
            for j, video in enumerate(videos):
                k, vlen = 4, video.shape[0]
                te = rng.randn(k, 16).astype(np.float32)
                centers = rng.rand(k) * (vlen - 6) + 2
                s = np.maximum(centers - 2, 0)
                e = np.minimum(centers + 2, vlen)
                arrays[f"text_embed_{i}_{j}"] = te
                arrays[f"start_{i}_{j}"] = s
                arrays[f"end_{i}_{j}"] = e
                batch.append({"text_embeds": te, "start": s, "end": e})
            batches.append(batch)
        buf = io.BytesIO()
        np.savez_compressed(buf, **arrays)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/align_batch", data=buf.getvalue(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            payload = json.loads(resp.read())
        ref = svc.align_batch_requests(videos, batches)
        assert payload["batches"] == ref
    finally:
        server.shutdown()


def test_ground_batch_matches_per_request():
    """ground_batch (bucket-grouped, batched on the device batch axis) ==
    ground() per request, across mixed narration buckets and video lengths;
    the HTTP /ground_batch endpoint round-trips the same results."""
    c = 24
    model = ExoGroundingTransformer(
        num_encoder_layers=1, num_decoder_layers=1,
        video_embed_dim=c, text_embed_dim=c, feature_dim=32, attn_impl="xla",
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, c)), jnp.zeros((1, 8, c)),
        jnp.zeros((1, 16), bool), jnp.zeros((1, 8), bool),
    )
    svc = GroundingService(model, params, seq_len=16, text_bucket=8)
    rng = np.random.RandomState(2)
    # mixed buckets: k in {3,5} -> kpad 8; k=11 -> kpad 16; varied T
    reqs = [
        {"video": rng.randn(t, c).astype(np.float32),
         "narration_embeds": rng.randn(k, c).astype(np.float32)}
        for t, k in ((16, 3), (12, 11), (9, 5), (16, 11), (7, 3))
    ]
    got = svc.ground_batch(reqs)
    for g, req in zip(got, reqs):
        ref = svc.ground(req["video"], req["narration_embeds"])
        np.testing.assert_allclose(g["start"], ref["start"], atol=1e-5)
        np.testing.assert_allclose(g["end"], ref["end"], atol=1e-5)
    # use_center_duration=False passthrough parity
    got_raw = svc.ground_batch(reqs, use_center_duration=False)
    ref_raw = svc.ground(reqs[0]["video"], reqs[0]["narration_embeds"],
                         use_center_duration=False)
    np.testing.assert_allclose(got_raw[0]["start"], ref_raw["start"], atol=1e-5)
    # over-long video rejected with the request index
    with pytest.raises(ValueError):
        svc.ground_batch([{
            "video": rng.randn(17, c).astype(np.float32),
            "narration_embeds": rng.randn(3, c).astype(np.float32),
        }])
    # HTTP endpoint round trip
    server = serve_http(ground_service=svc, host="127.0.0.1", port=0,
                        block=False)
    try:
        port = server.server_address[1]
        arrays = {}
        for i, r in enumerate(reqs):
            arrays[f"video_{i}"] = r["video"]
            arrays[f"narration_{i}"] = r["narration_embeds"]
        buf = io.BytesIO()
        np.savez_compressed(buf, **arrays)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/ground_batch", data=buf.getvalue(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            payload = json.loads(resp.read())
        assert payload["requests"] == got
    finally:
        server.shutdown()


# ---------------------------------------------------------------------------
# round-5 coalescing front (VERDICT r4 item 3): concurrent requests must use
# the batch machinery, not serialize on the service lock
# ---------------------------------------------------------------------------

import threading
import time


def test_align_coalescing_correctness_and_batching():
    """8 concurrent align() calls produce the same results as 8 serial ones
    AND reach the evaluator in fewer, larger predict() batches."""
    model, params = _tan()
    svc = AlignmentService(model, params, seq_len=16, transfer_dtype="float32")
    rng = np.random.RandomState(3)
    reqs = [
        AlignRequest(
            video=rng.randn(60, 24).astype(np.float32),
            text_embeds=rng.randn(4, 16).astype(np.float32),
        )
        for _ in range(8)
    ]
    serial = [svc.align(r) for r in reqs]  # also compiles the shape buckets

    calls = []
    orig = svc._evaluator.predict

    def counting(items, all_texts_active=None):
        calls.append(len(items))
        time.sleep(0.05)  # hold the device so followers actually queue
        return orig(items, all_texts_active=all_texts_active)

    svc._evaluator.predict = counting
    try:
        results = [None] * 8
        barrier = threading.Barrier(8)

        def worker(i):
            barrier.wait()
            results[i] = svc.align(reqs[i])

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
    finally:
        svc._evaluator.predict = orig

    for got, want in zip(results, serial):
        assert got["best_second"] == want["best_second"]
        np.testing.assert_allclose(got["score"], want["score"], rtol=1e-5)
    assert sum(calls) == 8  # every request served exactly once
    assert len(calls) < 8, calls  # ...in fewer, coalesced batches


def test_align_coalescing_throughput_2x_at_8_concurrent():
    """With a fixed per-dispatch cost, 8 concurrent requests through the
    coalescing front must finish >=2x faster than the serialized path
    (VERDICT r4 item 3 'done' criterion). The stub evaluator charges 50 ms
    per predict() CALL regardless of batch size — exactly the shape of the
    per-dispatch tunnel overhead the batch entry points amortize."""
    model, params = _tan()
    svc = AlignmentService(model, params, seq_len=16, transfer_dtype="float32")

    class _Stub:
        def predict(self, items, all_texts_active=None):
            time.sleep(0.05)
            return [
                {
                    "argmax": np.zeros(it["text_embed"].shape[0], np.int64),
                    "score": np.zeros(it["text_embed"].shape[0], np.float32),
                    "align_score": np.zeros(it["text_embed"].shape[0], np.float32),
                }
                for it in items
            ]

    svc._evaluator = _Stub()
    rng = np.random.RandomState(4)
    req = AlignRequest(
        video=rng.randn(60, 24).astype(np.float32),
        text_embeds=rng.randn(4, 16).astype(np.float32),
    )

    t0 = time.perf_counter()
    for _ in range(8):
        svc.align(req)
    serial_s = time.perf_counter() - t0  # 8 dispatches ~ 400 ms

    barrier = threading.Barrier(8)

    def worker():
        barrier.wait()
        svc.align(req)

    threads = [threading.Thread(target=worker) for _ in range(8)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    concurrent_s = time.perf_counter() - t0  # ~2 coalesced dispatches

    assert concurrent_s < serial_s / 2, (concurrent_s, serial_s)


def test_align_coalescing_mixed_protocols_split_batches():
    """all_texts_active is a per-call protocol switch: requests with and
    without coarse timestamps must never share a batch, and each must get
    its own protocol's results."""
    model, params = _tan()
    svc = AlignmentService(model, params, seq_len=16, transfer_dtype="float32")
    rng = np.random.RandomState(5)
    video = rng.randn(60, 24).astype(np.float32)
    te = rng.randn(4, 16).astype(np.float32)
    starts = np.sort(rng.rand(4)) * 50
    req_ts = AlignRequest(video=video, text_embeds=te, start=starts,
                          end=starts + 8)
    req_all = AlignRequest(video=video, text_embeds=te)
    want_ts = svc.align(req_ts)
    want_all = svc.align(req_all)

    results = {}
    barrier = threading.Barrier(6)

    def worker(i, req, key):
        barrier.wait()
        results[(key, i)] = svc.align(req)

    threads = [
        threading.Thread(target=worker, args=(i, req_ts, "ts")) for i in range(3)
    ] + [
        threading.Thread(target=worker, args=(i, req_all, "all")) for i in range(3)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    for i in range(3):
        assert results[("ts", i)]["best_second"] == want_ts["best_second"]
        assert results[("all", i)]["best_second"] == want_all["best_second"]


def test_ground_coalescing_concurrent_matches_serial():
    c = 24
    model = ExoGroundingTransformer(
        num_encoder_layers=1, num_decoder_layers=1,
        video_embed_dim=c, text_embed_dim=c, feature_dim=32, attn_impl="xla",
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, c)), jnp.zeros((1, 8, c)),
        jnp.zeros((1, 16), bool), jnp.zeros((1, 8), bool),
    )
    svc = GroundingService(model, params, seq_len=16, text_bucket=8)
    rng = np.random.RandomState(6)
    reqs = [
        (rng.randn(16, c).astype(np.float32), rng.randn(3, c).astype(np.float32))
        for _ in range(6)
    ]
    serial = [svc.ground(v, n) for v, n in reqs]

    results = [None] * 6
    barrier = threading.Barrier(6)

    def worker(i):
        barrier.wait()
        v, n = reqs[i]
        results[i] = svc.ground(v, n)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    for got, want in zip(results, serial):
        np.testing.assert_allclose(got["start"], want["start"], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(got["end"], want["end"], rtol=1e-5, atol=1e-6)


def test_coalescing_front_error_propagates_to_all_waiters():
    from exoground_tpu.serve import _CoalescingFront

    def boom(payloads, mode):
        raise RuntimeError("device on fire")

    front = _CoalescingFront(boom)
    errors = []

    def worker():
        try:
            front.submit(1)
        except RuntimeError as e:
            errors.append(str(e))

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=10)
    assert errors == ["device on fire"] * 4
    assert front._queue == []  # nothing wedged in the queue


def test_http_keepalive_connection_reuse():
    """HTTP/1.1 front: two requests over ONE persistent connection."""
    import http.client

    from exoground_tpu.serve import _encode_npz

    model, params = _tan()
    svc = AlignmentService(model, params, seq_len=16, transfer_dtype="float32")
    server = serve_http(align_service=svc, host="127.0.0.1", port=0,
                        block=False)
    port = server.server_address[1]
    try:
        rng = np.random.RandomState(7)
        body = _encode_npz({
            "video": rng.randn(40, 24).astype(np.float32),
            "text_embed": rng.randn(3, 16).astype(np.float32),
        })
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        outs = []
        for _ in range(2):  # same socket, two requests
            conn.request("POST", "/align", body)
            resp = conn.getresponse()
            assert resp.status == 200
            assert resp.version == 11  # HTTP/1.1 negotiated
            outs.append(json.loads(resp.read()))
        conn.close()
        assert outs[0]["best_second"] == outs[1]["best_second"]
    finally:
        server.shutdown()
