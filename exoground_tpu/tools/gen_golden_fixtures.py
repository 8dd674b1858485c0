"""Generate the self-contained golden fixtures under tests/golden/.

Run ONCE in an environment with torch and the reference mounted at
/root/reference; commits the resulting .npz files so tests/test_golden.py
can assert numeric parity forever after without either dependency:

    python -m exoground_tpu.tools.gen_golden_fixtures

Each fixture stores the reference model's (name, shape) parameter manifest
plus the reference outputs for deterministic seeded weights/inputs (see
tests/golden_common.py). Reference entry points exercised:
  * model/tan_model.py TemporalAligner forward + get_text_visual_sim_joint/
    _dual (tan_model.py:94-143, 231-306)
  * model/exo_ground_model.py ExoGroundingTransformer forward (:127-183)
  * train/loss.py get_loss — the 5 oracle configs (MIL-NCE + agreement +
    threshold + alignability BCE, loss.py:57-376)
  * train/loss_egoexo4d.py get_grounding_loss_reg_head (:73-145) and
    compute_info_nce_loss_cross_view / compute_l1_cosine_losses (:151-323)
"""

import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from tests import golden_common as G  # noqa: E402


def _to_torch_state(state_np):
    import torch

    return {k: torch.from_numpy(v.copy()) for k, v in state_np.items()}


_TMPDIRS = []


def _tmpdir(prefix):
    """mkdtemp tracked for removal at the end of main() — the loader
    generators materialize multi-MB synthetic worlds that must not
    accumulate in /tmp across runs."""
    import pathlib
    import tempfile

    d = pathlib.Path(tempfile.mkdtemp(prefix=prefix))
    _TMPDIRS.append(d)
    return d


def _cleanup_tmpdirs():
    import shutil

    while _TMPDIRS:
        shutil.rmtree(_TMPDIRS.pop(), ignore_errors=True)


def gen_tan_forward():
    import torch

    sys.path.insert(0, "/root/reference/model")
    import tan_model

    torch.manual_seed(0)
    model = tan_model.TemporalAligner(
        num_encoder_layers=2, num_decoder_layers=2,
        random_pos_start=0, use_alignability_head=1,
    ).eval()
    manifest = [(k, tuple(v.shape)) for k, v in model.state_dict().items()]
    state = G.synth_state(manifest, seed=7)
    model.load_state_dict(_to_torch_state(state))

    video, lang, vmask, lmask = G.tan_forward_inputs()
    with torch.no_grad():
        ref = model(
            torch.from_numpy(video), torch.from_numpy(lang),
            torch.from_numpy(vmask), torch.from_numpy(lmask),
            text_timestamp=None,
        )
    ev_video, ev_lang = G.tan_eval_inputs()
    with torch.no_grad():
        sim_joint = model.get_text_visual_sim_joint(
            torch.from_numpy(ev_video), torch.from_numpy(ev_lang)
        )
        sim_dual = model.get_text_visual_sim_dual(
            torch.from_numpy(ev_video), torch.from_numpy(ev_lang)
        )
    sim_joint = sim_joint["sim"] if isinstance(sim_joint, dict) else sim_joint
    sim_dual = sim_dual["sim"] if isinstance(sim_dual, dict) else sim_dual

    out = G.manifest_to_npz_fields(manifest)
    for key in ("logits_dual", "logits_joint", "dual_logits_alignability",
                "joint_logits_alignability"):
        out[f"out::{key}"] = ref[key].numpy()
    out["out::eval_sim_joint"] = sim_joint.numpy()
    out["out::eval_sim_dual"] = sim_dual.numpy()
    np.savez_compressed(os.path.join(G.GOLDEN_DIR, "tan_forward.npz"), **out)
    print("tan_forward.npz:", {k: v.shape for k, v in out.items() if k.startswith("out::")})


def gen_tan_forward_fullscale():
    """FULL-SCALE TAN fixture (VERDICT r3 missing-#3): E6D6, width 512,
    8x64 head split, 4096-d inputs at train window length 64, text pos-enc
    ON, plus both eval entries + alignability at a 200-frame global-mode
    shape with video AND text pos tables interpolated from the full 4096
    rows (tan_model.py:151-154,212-215). Only the (name, shape) manifest and
    the outputs are stored; the E6D6 weights regenerate from the seed."""
    import torch

    sys.path.insert(0, "/root/reference/model")
    import tan_model

    torch.manual_seed(0)
    model = tan_model.TemporalAligner(
        num_encoder_layers=6, num_decoder_layers=6,
        random_pos_start=0, use_alignability_head=1, use_text_pos_enc=1,
    ).eval()
    manifest = [(k, tuple(v.shape)) for k, v in model.state_dict().items()]
    state = G.synth_state(manifest, seed=17)
    model.load_state_dict(_to_torch_state(state))

    video, lang, vmask, lmask = G.tan_fullscale_inputs()
    with torch.no_grad():
        ref = model(
            torch.from_numpy(video), torch.from_numpy(lang),
            torch.from_numpy(vmask), torch.from_numpy(lmask),
            text_timestamp=None,
        )
    ev_video, ev_lang = G.tan_fullscale_eval_inputs()
    with torch.no_grad():
        sim_joint = model.get_text_visual_sim_joint(
            torch.from_numpy(ev_video), torch.from_numpy(ev_lang),
            interpolate_from=(4096, 4096),
        )
        sim_dual = model.get_text_visual_sim_dual(
            torch.from_numpy(ev_video), torch.from_numpy(ev_lang),
            interpolate_from=4096,
        )
        align = model.get_alignability(
            torch.from_numpy(ev_video), torch.from_numpy(ev_lang),
            interpolate_from=(4096, 4096),
        )

    out = G.manifest_to_npz_fields(manifest)
    for key in ("logits_dual", "logits_joint", "dual_logits_alignability",
                "joint_logits_alignability"):
        out[f"out::{key}"] = ref[key].numpy()
    out["out::eval_sim_joint"] = sim_joint.numpy()
    out["out::eval_sim_dual"] = sim_dual.numpy()
    out["out::eval_alignability_dual"] = align["alignability-dual"].numpy()
    out["out::eval_alignability_joint"] = align["alignability-joint"].numpy()
    np.savez_compressed(
        os.path.join(G.GOLDEN_DIR, "tan_forward_fullscale.npz"), **out
    )
    print("tan_forward_fullscale.npz:",
          {k: v.shape for k, v in out.items() if k.startswith("out::")})


def gen_exoground_forward():
    import torch

    sys.path.insert(0, "/root/reference/model")
    import exo_ground_model

    torch.manual_seed(0)
    model = exo_ground_model.ExoGroundingTransformer(
        num_encoder_layers=2, num_decoder_layers=2,
        random_pos_start=0, video_embed_dim=64, text_embed_dim=64,
        feature_dim=128, use_distill_nce_loss=False,
    ).eval()
    manifest = [(k, tuple(v.shape)) for k, v in model.state_dict().items()]
    state = G.synth_state(manifest, seed=11)
    model.load_state_dict(_to_torch_state(state))

    video, lang, vmask, lmask = G.exoground_inputs()
    with torch.no_grad():
        ref = model(
            torch.from_numpy(video), torch.from_numpy(lang),
            torch.from_numpy(vmask), torch.from_numpy(lmask),
        )
    out = G.manifest_to_npz_fields(manifest)
    out["out::interval_preds"] = ref["interval_preds"].numpy()
    np.savez_compressed(os.path.join(G.GOLDEN_DIR, "exoground_forward.npz"), **out)
    print("exoground_forward.npz:", out["out::interval_preds"].shape)


def _load_ref_loss():
    from tests._oracle_utils import stub_missing_modules

    stub_missing_modules()
    sys.path.insert(0, "/root/reference/train")
    sys.path.insert(0, "/root/reference")
    import loss as ref_loss

    return ref_loss


def gen_tan_loss():
    import torch

    ref_loss = _load_ref_loss()
    records = {}
    for model, agreement, threshold, align_head, agree_type in G.TAN_LOSS_CONFIGS:
        seed = G.TAN_LOSS_SEEDS[agree_type]
        (ld, lj, ed, ej, starts, ends, text_pad, video_pad,
         a_dual, a_joint, abs_pos) = G.tan_loss_inputs(seed=seed)
        b, s, t, _, n = ld.shape
        args = types.SimpleNamespace(
            model=model, sim="cos", learn_agreement=agreement,
            temporal_agreement_type=agree_type, loss_threshold=threshold,
            use_alignability_head=align_head, optim_policy="default",
        )
        logits_t = {
            "logits_dual": torch.from_numpy(ld.copy()),
            "logits_joint": torch.from_numpy(lj.copy()),
            "dual_logits_alignability": torch.from_numpy(a_dual.copy()),
            "joint_logits_alignability": torch.from_numpy(
                np.repeat(a_joint, 3, axis=1)[:, :3].copy()
            ),
        }
        if model == "cotrain":
            logits_t["ema-logits_dual"] = torch.from_numpy(ed.copy())
            logits_t["ema-logits_joint"] = torch.from_numpy(ej.copy())
        input_data = {
            "start": starts, "end": ends,
            "text": [[f"s{i}{j}" for j in range(len(starts[i]))]
                     for i in range(b)],
        }
        ref = ref_loss.get_loss(
            input_data,
            torch.zeros(b, t, 8), torch.zeros(b, n, 8),
            torch.from_numpy(video_pad), torch.from_numpy(text_pad),
            logits_t, args,
            abs_text_pos=torch.from_numpy(abs_pos),
        )
        tag = f"{model}_{agreement}_{threshold}_{align_head}_{agree_type}"
        for key in G.TAN_LOSS_KEYS:
            if key in ref:
                records[f"{tag}::{key}"] = np.float64(float(ref[key]))
    np.savez(os.path.join(G.GOLDEN_DIR, "tan_loss.npz"), **records)
    print("tan_loss.npz:", len(records), "scalars")


def _load_ref_egoexo():
    from tests._oracle_utils import stub_missing_modules

    stub_missing_modules()
    sys.path.insert(0, "/root/reference/train")
    sys.path.insert(0, "/root/reference")
    import loss_egoexo4d as ref

    return ref


def gen_grounding_loss():
    import torch

    ref = _load_ref_egoexo()
    out = {}
    preds, starts, ends, pad, t = G.grounding_loss_inputs()
    b = preds.shape[0]
    per_second_views = [["0"] * t for _ in range(b)]
    for center_duration in (True, False):
        args = types.SimpleNamespace(
            use_center_duration=center_duration, iou_loss_eps=1e-8,
            iou_thresholds=[0.1, 0.3, 0.5, 0.7], test=False,
        )
        input_data = {
            "mean": torch.from_numpy((starts + ends) / 2),
            "duration": torch.from_numpy(np.abs(ends - starts)),
            "starts": torch.from_numpy(starts),
            "ends": torch.from_numpy(ends),
            "metadata": {"per_second_views": per_second_views},
        }
        ref_dict, ref_iou = ref.get_grounding_loss_reg_head(
            input_data, {"interval_preds": torch.from_numpy(preds)},
            torch.from_numpy(pad), args,
        )
        tag = "cd" if center_duration else "se"
        for key in ("loss", "IoU loss", "mean IoU", "IoU>=0.1", "IoU>=0.3",
                    "IoU>=0.5", "IoU>=0.7"):
            out[f"{tag}::{key}"] = np.float64(float(ref_dict[key]))
        out[f"{tag}::iou_map"] = ref_iou.numpy()

    feats, ego, pos, neg, svn_idx, video_feats = G.vi_infonce_inputs()
    for same_view in (False, True):
        ref_nce = ref.compute_info_nce_loss_cross_view(
            torch.from_numpy(feats), torch.from_numpy(ego),
            torch.from_numpy(pos), torch.from_numpy(neg),
            torch.from_numpy(svn_idx) if same_view else None,
            torch.from_numpy(video_feats) if same_view else None,
            only_same_view_negative=False,
        ).numpy()
        out[f"vi_{int(same_view)}::nce"] = np.asarray(ref_nce)
    ref_l1, ref_pc, ref_nc = ref.compute_l1_cosine_losses(
        torch.from_numpy(feats), torch.from_numpy(ego),
        torch.from_numpy(pos), torch.from_numpy(neg),
    )
    out["vi::l1"] = np.asarray(ref_l1.numpy())
    out["vi::pos_cos"] = np.asarray(ref_pc.numpy())
    out["vi::neg_cos"] = np.asarray(ref_nc.numpy())
    np.savez(os.path.join(G.GOLDEN_DIR, "grounding_loss.npz"), **out)
    print("grounding_loss.npz:", len(out), "entries")


def gen_vi_forward():
    """Transformer ViewInvariantEncoder forward (vi_encoder.py:8-163),
    multi-view config (num_max_views=2 pos tiling)."""
    import torch

    sys.path.insert(0, "/root/reference/model")
    import vi_encoder as ref_vi

    torch.manual_seed(0)
    model = ref_vi.ViewInvariantEncoder(
        num_encoder_layers=2, random_pos_start=0, video_embed_dim=48,
        feature_dim=32, use_distill_nce_loss=True,
        multi_view=True, num_max_views=2,
    ).eval()
    manifest = [(k, tuple(v.shape)) for k, v in model.state_dict().items()]
    state = G.synth_state(manifest, seed=13)
    model.load_state_dict(_to_torch_state(state))

    video, ego = G.vi_encoder_inputs()
    b, t = video.shape[:2]
    with torch.no_grad():
        ref = model(
            torch.from_numpy(video), None,
            torch.zeros(b, t, dtype=torch.bool), None,
            egocentric_video_embed=torch.from_numpy(ego),
        )
    out = G.manifest_to_npz_fields(manifest)
    out["out::low_dim_features"] = ref["low_dim_features"].numpy()
    out["out::high_dim_features"] = ref["high_dim_features"].numpy()
    np.savez_compressed(os.path.join(G.GOLDEN_DIR, "vi_forward.npz"), **out)
    print("vi_forward.npz:", out["out::high_dim_features"].shape)


def gen_word2vec():
    """Frozen word2vec text tower + tokenizer (word2vec_model.py:26-102).

    The reference classes load cluster checkpoints in __init__, so both are
    instantiated via __new__ + attribute injection (the oracle-test pattern)
    on a scaled-down {word_embd, fc1, fc2} world from golden_common."""
    import torch

    sys.path.insert(0, "/root/reference/model")
    import word2vec_model as ref_w2v

    manifest = G.word2vec_manifest()
    state = G.synth_state(manifest, seed=17)
    model = ref_w2v.Word2VecModel.__new__(ref_w2v.Word2VecModel)
    torch.nn.Module.__init__(model)
    model.word_embd = torch.nn.Embedding(G.W2V_VOCAB_N, G.W2V_EMB)
    model.fc1 = torch.nn.Linear(G.W2V_EMB, G.W2V_HID)
    model.fc2 = torch.nn.Linear(G.W2V_HID, G.W2V_OUT)
    model.load_state_dict(_to_torch_state(state))
    model.eval()

    ids, mask = G.word2vec_inputs()
    with torch.no_grad():
        ref = model(
            torch.from_numpy(ids), attention_mask=torch.from_numpy(mask.copy())
        )

    tok = ref_w2v.Word2VecTokenizer.__new__(ref_w2v.Word2VecTokenizer)
    tok.word_to_token = dict(G.GOLDEN_VOCAB)
    tok.token_to_word = {v: k for k, v in G.GOLDEN_VOCAB.items()}
    tok.max_words = G.GOLDEN_MAX_WORDS
    enc = tok(list(G.GOLDEN_SENTENCES), return_tensors="pt")

    out = G.manifest_to_npz_fields(manifest)
    out["out::last_hidden_state"] = ref["last_hidden_state"].numpy()
    out["out::pooler_output"] = ref["pooler_output"].numpy()
    out["out::tok_input_ids"] = enc["input_ids"].numpy()
    out["out::tok_attention_mask"] = enc["attention_mask"].numpy()
    np.savez_compressed(os.path.join(G.GOLDEN_DIR, "word2vec.npz"), **out)
    print("word2vec.npz:", out["out::pooler_output"].shape,
          out["out::tok_input_ids"].shape)


def gen_s3d():
    """S3D-G trunk forward (s3d_milnce/s3dg.py:250-348): space-to-depth,
    SAME-padded pools, SelfGating, frozen-BN inference math, mean-pool.
    Weights come from synth_state_bn (BatchNorm running_var must stay
    positive); the same seed regenerates them on the test side."""
    import torch

    sys.path.insert(0, "/root/reference/model/s3d_milnce")
    from s3dg import S3D as TorchS3D

    torch.manual_seed(0)
    model = TorchS3D(dict_path=None, num_classes=24).eval()
    manifest = [(k, tuple(v.shape)) for k, v in model.state_dict().items()]
    state = G.synth_state_bn(manifest, seed=23)
    model.load_state_dict(_to_torch_state(state))

    x = G.s3d_inputs()
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).numpy()  # pooled trunk (1, 1024)

    out = G.manifest_to_npz_fields(manifest)
    out["out::pooled_trunk"] = ref
    np.savez_compressed(os.path.join(G.GOLDEN_DIR, "s3d.npz"), **out)
    print("s3d.npz:", ref.shape)


def gen_align_protocol():
    """HTM-Align protocol metrics (eval_zeroshot_align.py:96-252) from the
    reference's ACTUAL eval loop on the deterministic synthetic world —
    overlap-seq via the imported reference function, global via the
    oracle-validated transcription (tests/test_oracle_eval.py). Freezes
    Recall/AUC for head off/on in both methods."""
    from tests import test_oracle_eval as OE

    mod = OE._load_ref_eval_mod()
    out = {}
    for use_head in (False, True):
        tag = "head" if use_head else "nohead"
        items, table = G.align_protocol_items()
        mod.HTM_Align = OE._fake_htm_align(items)
        args = types.SimpleNamespace(
            seq_len=64, use_alignability_head=use_head
        )
        ref = mod.test_alignment_htm(
            OE._ref_closure(table, use_head), "cpu", args
        )
        out[f"out::overlap_{tag}_recall"] = np.float64(ref["Recall"])
        out[f"out::overlap_{tag}_auc"] = np.float64(ref["AUC"])

        g_items, g_table = G.align_protocol_items(seed=1)
        gref = OE._ref_global_metrics(g_items, g_table, use_head)
        out[f"out::global_{tag}_recall"] = np.float64(gref["Recall"])
        out[f"out::global_{tag}_auc"] = np.float64(gref["AUC"])
    np.savez_compressed(
        os.path.join(G.GOLDEN_DIR, "align_protocol.npz"), **out
    )
    print("align_protocol.npz:", {k: float(v) for k, v in out.items()})


def gen_yc2_protocol():
    """YouCook2 retrieval metrics (eval_zeroshot_retrieval.py:156-256) from
    the reference's ACTUAL eval loop on the deterministic synthetic world
    (tests/test_oracle_retrieval.py). Freezes all 12 raw/centered/
    standardized R1/R5/R10/MR values."""
    from tests import test_oracle_retrieval as OR

    mod = OR._load_ref_mod()
    items, table, w_vis, w_txt = G.yc2_protocol_items()
    ref = OR._run_reference_yc2(mod, items, table, w_vis, w_txt)
    out = {f"out::{k}": np.float64(ref[k]) for k in G.YC2_METRIC_KEYS}
    np.savez_compressed(
        os.path.join(G.GOLDEN_DIR, "retrieval_protocol.npz"), **out
    )
    print("retrieval_protocol.npz:", {k: float(v) for k, v in out.items()})


def _np(v):
    return v.numpy() if hasattr(v, "numpy") else np.asarray(v)


def gen_egoexo_loader():
    """EgoExo4D data-layer items (loader_egoexo4d.py __getitem__ +
    precompute_windows + loader_egoexo4d_tan.py) from the reference's ACTUAL
    loader classes over the deterministic synthetic world
    (tests/world_egoexo.py). Items are stored positionally with a parallel
    window-key list — reference row order is filesystem-dependent (listdir),
    so the golden test matches by key, exactly like the oracle tests."""
    import pathlib
    import tempfile

    from tests import test_oracle_egoexo_loader as OL
    from tests import world_egoexo as W

    ref_cls = OL._load_ref_cls()
    root = _tmpdir("egoexo_golden_world_")
    world = W.build_egoexo_world(root)

    out = {}
    for tag, flags in W.GOLDEN_CONFIGS.items():
        tmp = _tmpdir(f"egoexo_ref_{tag}_")
        ref = OL._ref_loader(ref_cls, world, tmp, **dict(flags))
        keys = []
        for pos, (_, row) in enumerate(ref.windows.iterrows()):
            keys.append("|".join(map(str, W.window_key(row))))
            item = ref[pos]
            kid = f"{tag}::{pos}"
            for k in W.COMPARE_KEYS:
                if k in item:
                    out[f"{kid}::{k}"] = _np(item[k])
            md = item["metadata"]
            for k in W.META_KEYS:
                out[f"{kid}::meta.{k}"] = np.array(
                    [str(x) for x in np.atleast_1d(md[k])]
                )
            out[f"{kid}::meta.start_sec"] = np.array(int(md["start_sec"]))
        out[f"{tag}::keys"] = np.array(keys)

    # TAN-style variant (loader_egoexo4d_tan.py:270-342)
    tmp = _tmpdir("egoexo_ref_tan_")
    tref = OL._ref_tan_loader(world, tmp, split="val", views="exo",
                              model="joint", use_distill_nce_loss=False)
    keys = []
    for pos, (_, row) in enumerate(tref.windows.iterrows()):
        keys.append("|".join(map(str, W.window_key(row))))
        item = tref[pos]
        kid = f"tan::{pos}"
        for k in ("video", "padding_mask", "narration_features",
                  "narration_padding_mask", "start", "end"):
            out[f"{kid}::{k}"] = _np(item[k])
        out[f"{kid}::meta.narrations"] = np.array(
            [str(x) for x in item["metadata"]["narrations"]]
        )
    out["tan::keys"] = np.array(keys)

    np.savez_compressed(
        os.path.join(G.GOLDEN_DIR, "egoexo_loader.npz"), **out
    )
    n_items = sum(
        len(v) for k, v in out.items() if k.endswith("::keys")
    )
    print(f"egoexo_loader.npz: {n_items} items, {len(out)} fields")


def gen_htm_loader():
    """HowTo100M data-layer items from the reference's ACTUAL loaders over
    the deterministic worlds (tests/world_htm.py): HTM_FeatureLoader
    (loader_htm.py:62-257 — window anchor, sentence accumulation/trim/break,
    tokenization, pad-by-last source window) and HTM_Align window mode
    (loader_htm_align.py:38-164 incl. its no-trim-break zero-width quirk).
    The anchor draw rides GLOBAL np.random — each frozen item records the
    seed set immediately before the reference __getitem__."""
    import pathlib
    import tempfile

    from tests import test_oracle_htm_loader as OH
    from tests import world_htm as WH

    ref_mod = OH._load_ref_mod()
    out = {}

    root = _tmpdir("htm_golden_world_")
    world = WH.build_htm_world(root)
    ref = OH._ref_loader(ref_mod, world)
    for i, vid in enumerate(ref.video_info):
        for seed in WH.GOLDEN_SEEDS:
            np.random.seed(seed)
            item = ref[i]
            kid = f"feat::{vid}::{seed}"
            out[f"{kid}::text"] = np.array([str(t) for t in item["text"]])
            out[f"{kid}::start"] = np.asarray(item["start"], np.float64)
            out[f"{kid}::end"] = np.asarray(item["end"], np.float64)
            out[f"{kid}::token"] = _np(item["token"])
            out[f"{kid}::video"] = _np(item["video"])
            out[f"{kid}::abs_text_start"] = np.asarray(
                item["abs_text_start"], np.float64)
            out[f"{kid}::abs_text_end"] = np.asarray(
                item["abs_text_end"], np.float64)
            out[f"{kid}::cut_start"] = np.array(int(item["cut_start"]))
            out[f"{kid}::cut_end"] = np.array(int(item["cut_end"]))
    out["feat::vids"] = np.array(list(ref.video_info))

    aroot = _tmpdir("htm_golden_align_")
    align_root = WH.build_align_world(aroot)
    aref = OH._ref_align_loader(ref_mod, align_root)
    for i, vid in enumerate(aref.video_info):
        for seed in WH.GOLDEN_SEEDS:
            np.random.seed(seed)
            item = aref[i]
            kid = f"align::{vid}::{seed}"
            out[f"{kid}::text"] = np.array([str(t) for t in item["text"]])
            out[f"{kid}::start"] = np.asarray(item["start"], np.float64)
            out[f"{kid}::end"] = np.asarray(item["end"], np.float64)
            out[f"{kid}::aligned"] = np.asarray(item["align"], np.int64)
            out[f"{kid}::token"] = np.stack([_np(t) for t in item["token"]])
            out[f"{kid}::video"] = _np(item["video"])
    out["align::vids"] = np.array(list(aref.video_info))

    np.savez_compressed(os.path.join(G.GOLDEN_DIR, "htm_loader.npz"), **out)
    print(f"htm_loader.npz: {len(out)} fields")


def gen_lemma_loader():
    """LEMMA data-layer items (loader_lemma.py) from the reference's ACTUAL
    loader over the deterministic world (tests/world_lemma.py). Window order
    is fully deterministic on both sides — items stored positionally with the
    key list as a cross-check."""
    import pathlib
    import tempfile

    from tests import test_oracle_lemma_loader as OLM
    from tests import world_lemma as WL

    ref_cls = OLM._load_ref_cls()
    root = _tmpdir("lemma_golden_world_")
    world = WL.build_lemma_world(root)

    out = {}
    for tag, (split, distill) in WL.GOLDEN_CONFIGS.items():
        tmp = _tmpdir(f"lemma_ref_{tag}_")
        ref = OLM._ref_loader(ref_cls, world, tmp, split,
                              use_distill_nce_loss=distill)
        keys = ["|".join(map(str, WL.window_key(r)))
                for _, r in ref.windows.iterrows()]
        out[f"{tag}::keys"] = np.array(keys)
        for pos in range(len(keys)):
            item = ref[pos]
            kid = f"{tag}::{pos}"
            for k in WL.COMPARE_KEYS:
                if k in item:
                    out[f"{kid}::{k}"] = _np(item[k])
            md = item["metadata"]
            for k in WL.META_KEYS:
                out[f"{kid}::meta.{k}"] = np.array(
                    [str(x) for x in np.atleast_1d(md[k])]
                )
    np.savez_compressed(os.path.join(G.GOLDEN_DIR, "lemma_loader.npz"), **out)
    print(f"lemma_loader.npz: {len(out)} fields")


def gen_yc2_loader():
    """YouCook2 feature-dataset items (eval_zeroshot_retrieval.py:29-153)
    from the reference's ACTUAL class over the deterministic world
    (tests/world_yc2.py): linspace window placement, adaptive
    covering-vs-inside trim spans, frame clipping, fixed-seq_len mode."""
    import pathlib
    import tempfile

    from tests import test_oracle_yc2_loader as OY
    from tests import world_yc2 as WY

    ref_cls = OY._load_ref_cls()
    root = _tmpdir("yc2_golden_world_")
    world = WY.build_yc2_world(root)

    out = {}
    for tag, (num_clips, seq_len) in WY.GOLDEN_CONFIGS.items():
        ref = OY._ref_loader(ref_cls, world, num_clips, seq_len)
        out[f"{tag}::n"] = np.array(len(ref.video_info))
        for i in range(len(ref.video_info)):
            item = ref[i]
            kid = f"{tag}::{i}"
            out[f"{kid}::video"] = _np(item["video"])
            out[f"{kid}::str"] = np.array(str(item["str"]))
            out[f"{kid}::start"] = np.array(float(item["start"]))
            out[f"{kid}::end"] = np.array(float(item["end"]))
            if seq_len == -1:
                out[f"{kid}::start_idx"] = _np(item["start_idx"])
                out[f"{kid}::end_idx"] = _np(item["end_idx"])
    np.savez_compressed(os.path.join(G.GOLDEN_DIR, "yc2_loader.npz"), **out)
    print(f"yc2_loader.npz: {len(out)} fields")


def main():
    os.makedirs(G.GOLDEN_DIR, exist_ok=True)
    try:
        gen_tan_forward()
        gen_tan_forward_fullscale()
        gen_exoground_forward()
        gen_tan_loss()
        gen_grounding_loss()
        gen_vi_forward()
        gen_word2vec()
        gen_s3d()
        gen_align_protocol()
        gen_yc2_protocol()
        gen_egoexo_loader()
        gen_htm_loader()
        gen_lemma_loader()
        gen_yc2_loader()
    finally:
        _cleanup_tmpdirs()


if __name__ == "__main__":
    main()
