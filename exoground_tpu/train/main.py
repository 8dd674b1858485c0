"""CLI entry point: ``python -m exoground_tpu.train.main --dataset ... --model ...``

Replaces the reference's torchrun scripts (train/main.py,
train/main_egoexo4d.py, train/main_egoexo4d_distributed.py, selected by
--dataset via importlib at main_egoexo4d_distributed.py:893-910). One entry
covers every pipeline; multi-host TPU pods initialize via
``--multihost`` -> jax.distributed.initialize() (all hosts run the same
command; the mesh spans all chips).

Model zoo dispatch (reference main_egoexo4d_distributed.py:626-713):
  view_invariant -> ViewInvariantMLP (the variant actually trained, :679)
  grounding      -> GroundingModel with frozen VI encoder from
                    --vi_encoder_path (:628-657)
  joint          -> ExoGroundingTransformer
  init/cotrain   -> TemporalAligner (TAN pipeline)

Expected --data_root layout (EgoExo4D):
  splits/{split}.csv, narration_annotations/{split}.csv,
  all_camera_rankings.json, takes.json,
  egovlpv2_video_features/*.pt, narration_features/{take}/*.pt
"""

from __future__ import annotations

import os

import numpy as np


def build_egoexo_dataset(cfg, split: str):
    from exoground_tpu.data.egoexo4d import (
        EgoExo4DDataset,
        EgoExoConfig,
        EgoExoSource,
    )

    root = cfg.data_root
    src = EgoExoSource.from_paths(
        split_csv=os.path.join(root, "splits", f"{split}.csv"),
        annotations_csv=os.path.join(
            root,
            "keystep_annotations" if cfg.use_keysteps else "narration_annotations",
            f"{split}.csv",
        ),
        camera_rankings_json=os.path.join(root, "all_camera_rankings.json"),
        takes_json=os.path.join(root, "takes.json"),
        video_feature_root=os.path.join(root, "egovlpv2_video_features"),
        narration_feature_root=os.path.join(root, "narration_features"),
        audio_feature_root=os.path.join(root, "audio_features", split)
        if cfg.use_audio else None,
        camera_pose_root=os.path.join(root, "camera_pose")
        if os.path.isdir(os.path.join(root, "camera_pose")) else None,
    )
    dcfg = EgoExoConfig(
        duration=cfg.seq_len, hop_length=cfg.seq_hop, use_audio=cfg.use_audio,
        use_keysteps=cfg.use_keysteps, views=cfg.views,
        use_distill_nce_loss=cfg.use_distill_nce_loss,
        use_center_duration=cfg.use_center_duration,
        multi_view_egoexo=cfg.multi_view_egoexo,
        num_max_views=cfg.num_max_views,
        randomize_narration_order=cfg.randomize_narration_order,
        curriculum_train=cfg.curriculum_train,
        sorted_curr_train=cfg.sorted_curr_train,
        model=cfg.model, exo_mode=cfg.exos,
        minimum_four_exo_takes=cfg.minimum_four_exo_takes,
        same_view_negative=cfg.same_view_negative,
        reverse_ranking=cfg.reverse_ranking,
        randomize_ranking=cfg.randomize_ranking,
        exo_exo_distill=cfg.exo_exo_distill,
        feature_dim=cfg.text_feature_dim, seed=cfg.seed, fps=cfg.fps,
    )
    csv_cache = os.path.join(
        root,
        f"{'grounding' if cfg.model in ('grounding', 'joint') else 'view_invariant'}"
        f"_{split}_{cfg.views}_ks={cfg.use_keysteps}_ct={cfg.curriculum_train}"
        f"_exos={cfg.exos}_windows.csv",
    )
    return EgoExo4DDataset(dcfg, src, split=split, window_csv_path=csv_cache)


def build_lemma_dataset(cfg, split: str):
    """LEMMA tree (reference loader_lemma.py paths):
    splits/{split}.csv (video_id,duration_sec),
    keystep_annotations/{split}.csv + all.csv (hoi_index,natural_language),
    vid_feats/*.pt keyed {video_id}_{cam}, keystep_feats/{hoi}.pt."""
    import pandas as pd

    from exoground_tpu.data import FeatureStore
    from exoground_tpu.data.lemma import LemmaConfig, LemmaDataset

    root = cfg.data_root
    split_rows = pd.read_csv(
        os.path.join(root, "splits", f"{split}.csv")
    ).to_dict("records")
    annotations = pd.read_csv(
        os.path.join(root, "keystep_annotations", f"{split}.csv")
    ).to_dict("records")
    hoi_df = pd.read_csv(os.path.join(root, "keystep_annotations", "all.csv"))
    hoi_text_map = dict(zip(hoi_df["hoi_index"], hoi_df["natural_language"]))
    dcfg = LemmaConfig(
        duration=cfg.seq_len, hop_length=cfg.seq_hop, views=cfg.views,
        use_distill_nce_loss=cfg.use_distill_nce_loss,
        curriculum_train=cfg.curriculum_train,
        same_view_negative=cfg.same_view_negative,
        reverse_ranking=cfg.reverse_ranking,
        randomize_ranking=cfg.randomize_ranking,
        feature_dim=cfg.text_feature_dim, seed=cfg.seed, fps=cfg.fps,
    )
    return LemmaDataset(
        dcfg, split_rows, annotations, hoi_text_map,
        video_store=FeatureStore(os.path.join(root, "vid_feats"), (".pt",)),
        narration_store=FeatureStore(
            os.path.join(root, "keystep_feats"), (".pt",)
        ),
        split=split,
    )


def build_model(cfg):
    from exoground_tpu.models import TemporalAligner
    from exoground_tpu.models.grounding import ExoGroundingTransformer, GroundingModel
    from exoground_tpu.models.vi_encoder import ViewInvariantMLP

    attn = None if cfg.attn_impl == "auto" else cfg.attn_impl
    if cfg.model in ("init", "cotrain"):
        return TemporalAligner(
            num_encoder_layers=cfg.num_encoder_layers,
            num_joint_layers=cfg.num_decoder_layers,
            sim=cfg.sim, pos_enc=cfg.pos_enc,
            use_text_pos_enc=bool(cfg.use_text_pos_enc),
            use_alignability_head=bool(cfg.use_alignability_head),
            attn_impl=attn,
        )
    if cfg.model == "view_invariant":
        return ViewInvariantMLP(video_embed_dim=cfg.video_feature_dim)
    common = dict(
        num_encoder_layers=cfg.num_encoder_layers,
        num_decoder_layers=cfg.num_decoder_layers,
        use_decoder=cfg.use_decoder,
        pos_enc=cfg.pos_enc,
        use_text_pos_enc=cfg.use_text_pos_enc,
        use_audio=cfg.use_audio,
        video_embed_dim=cfg.video_feature_dim,
        text_embed_dim=cfg.text_feature_dim,
        audio_embed_dim=cfg.audio_feature_dim,
        feature_dim=cfg.feature_dim,
        use_distill_nce_loss=cfg.use_distill_nce_loss,
        multi_view=cfg.views == "multi",
        num_max_views=cfg.num_max_views if cfg.views == "multi" else 1,
        use_pairwise_distill_nce_loss=cfg.use_pairwise_distill_nce_loss,
        pairwise_distill_mode=cfg.pairwise_distill_mode,
        attn_impl=attn,
    )
    if cfg.model == "grounding":
        return GroundingModel(vi_encoder_type="mlp", **common)
    return ExoGroundingTransformer(**common)


def load_frozen_vi_encoder(trainer, cfg):
    """Reference :628-657: initialize GroundingModel's vi_encoder branch from
    a pretrained view-invariant checkpoint, non-strict."""
    if not cfg.vi_encoder_path or not os.path.exists(cfg.vi_encoder_path):
        return
    import jax

    from exoground_tpu.train.checkpoint import load_state, restore_into

    blob = load_state(cfg.vi_encoder_path)
    params = jax.device_get(trainer.params)
    if "vi_encoder" in params:
        params["vi_encoder"] = restore_into(
            params["vi_encoder"], blob["state_dict"]
        )
        trainer.params = params
        trainer._replicate()
        print(f"[main] loaded frozen VI encoder from {cfg.vi_encoder_path}")


def main(argv=None):
    from exoground_tpu.data import ShardedSampler, ThreadedLoader
    from exoground_tpu.data.sampling import CurriculumShardedSampler
    from exoground_tpu.train.config import parse_args, set_path
    from exoground_tpu.train.trainer import EgoExoTrainer, TANTrainer

    cfg = parse_args(argv)
    if cfg.multihost:
        import jax

        jax.distributed.initialize()
    set_path(cfg)

    if cfg.dataset in ("egoexo4d", "lemma"):
        build = (
            build_lemma_dataset if cfg.dataset == "lemma" else build_egoexo_dataset
        )
        train_ds = build(cfg, "train")
        val_ds = build(cfg, "val" if not cfg.test else "test")
        import jax

        shards = jax.process_count()
        shard = jax.process_index()
        if cfg.curriculum_train and cfg.sorted_curr_train == "sorted":
            sampler = CurriculumShardedSampler(
                len(train_ds), shards, shard, seed=cfg.seed,
                max_epochs=cfg.epochs, start_frac=cfg.start_frac,
                end_epoch_frac=cfg.end_epoch_frac,
                fixed_ramp=cfg.fixed_curriculum,
            )
        else:
            sampler = ShardedSampler(len(train_ds), shards, shard, seed=cfg.seed)
        train_loader = ThreadedLoader(
            train_ds, cfg.batch_size, sampler=sampler,
            num_workers=cfg.num_workers,
        )
        # eval must see EVERY sample: the sharded eval step pads ragged
        # tails with dummy rows, so the last partial batch is kept
        val_loader = ThreadedLoader(
            val_ds, cfg.batch_size,
            sampler=ShardedSampler(len(val_ds), shards, shard, shuffle=False),
            num_workers=cfg.num_workers, drop_last=False,
        )
        model = build_model(cfg)
        sample = next(iter(train_loader))
        trainer = EgoExoTrainer(
            model, cfg, sample, iters_per_epoch=len(train_loader)
        )
        if cfg.model == "grounding":
            load_frozen_vi_encoder(trainer, cfg)
        if cfg.resume:
            trainer.load_checkpoint(cfg.resume, mode="resume")
        elif cfg.pretrain:
            trainer.load_checkpoint(cfg.pretrain, mode="pretrain")
        if cfg.test:
            trainer.load_checkpoint(cfg.test, mode="test")
            loss, results = trainer.evaluate(val_loader, epoch=0, test=True)
            print({"loss": loss, **{k: round(v, 4) for k, v in results.items()}})
            return results
        return trainer.fit(train_loader, val_loader, dataset=train_ds)

    if cfg.dataset == "htm-aa":
        return run_htm_e2e(cfg)
    if cfg.dataset.startswith("htm"):
        return run_htm_tan(cfg)
    raise SystemExit(f"unknown --dataset {cfg.dataset}")


def run_htm_e2e(cfg):
    """End-to-end S3D finetune on HTM-AA clips (reference end2end/main_nce.py:
    275-403 + video_loader.py:39-174), the ``--dataset htm-aa --model s3d``
    route.

    Expected --data_root layout:
      videos/{vid}.mp4                raw HTM videos (ffmpeg host decode;
                                      grey-frame fallback when absent)
      {auto_align_tag}.csv            HTM-AA alignment (vid,timestamp,text —
                                      htm_aa/readme.md:24-32)
      htm_vlen.csv (optional)         video-length filter 64 < vlen < 2000
                                      (video_loader.py:70-73, MIL-NCE rule)
      s3d_dict.npy + s3d_howto100m.pth  word2vec tokenizer + MIL-NCE weights
                                      (backbone init unless --no-pt_backbone)

    Flags honored: --num_frames, --fps (default 5), --freezeBN,
    --pt_backbone, --lr_backbone, --convert_from_frozen_bn, --auto_align_tag,
    --clip_grad, --backprop_freq (end2end/config.py:6-53). One clip per csv
    row per epoch, sampled inside the aligned span (the reference instead
    draws num_sample_per_video=2 random rows per video per epoch — same
    expected coverage, deterministic per-epoch keys here).
    """
    import jax
    import pandas as pd

    from exoground_tpu.data import ShardedSampler, ThreadedLoader
    from exoground_tpu.data.video_clips import ClipConfig, HTMClipDataset
    from exoground_tpu.models.s3d import S3D
    from exoground_tpu.models.word2vec import Word2VecTokenizer
    from exoground_tpu.train.trainer import S3DTrainer
    from exoground_tpu.utils.convert import (
        convert_s3d_state_dict,
        convert_sentence_embedding_from_s3d,
        load_torch_checkpoint,
    )

    root = cfg.data_root
    tokenizer = Word2VecTokenizer.from_dict_file(
        os.path.join(root, "s3d_dict.npy")
    )
    ckpt = load_torch_checkpoint(os.path.join(root, "s3d_howto100m.pth"))
    if cfg.convert_from_frozen_bn:
        # legacy FrozenBN checkpoints store bn scale under '.scale'
        # (reference main_nce.py:303-310 remaps on load)
        ckpt = {
            (k.replace(".scale", ".weight") if ".bn" in k else k): v
            for k, v in ckpt.items()
        }
    text_params = convert_sentence_embedding_from_s3d(ckpt)

    aa = pd.read_csv(os.path.join(root, f"{cfg.auto_align_tag}.csv"))
    vlen_path = os.path.join(root, "htm_vlen.csv")
    if os.path.exists(vlen_path):
        vlen_df = pd.read_csv(vlen_path)
        keep = set(
            vlen_df["vid"][(vlen_df["vlen"] < 2000) & (vlen_df["vlen"] > 64)]
        )
        aa = aa[aa["vid"].isin(keep)]
    clip_dur = cfg.num_frames / cfg.fps
    pairs = [
        {
            "vid": r["vid"], "text": r["text"],
            # clip centered on the aligned timestamp (video_loader.py:125-131)
            "start": max(float(r["timestamp"]) - clip_dur / 2, 0.0),
            "end": float(r["timestamp"]) + clip_dur / 2,
        }
        for r in aa.to_dict("records")
    ]
    if not pairs:
        raise SystemExit(f"no HTM-AA pairs under {root}")
    dcfg = ClipConfig(
        video_root=os.path.join(root, "videos"), fps=cfg.fps,
        num_frames=cfg.num_frames, seed=cfg.seed,
    )
    train_ds = HTMClipDataset(dcfg, pairs, tokenizer)
    shards, shard = jax.process_count(), jax.process_index()
    train_loader = ThreadedLoader(
        train_ds, cfg.batch_size,
        sampler=ShardedSampler(len(train_ds), shards, shard, seed=cfg.seed),
        num_workers=cfg.num_workers,
    )

    # output dim follows the text tower's fc2 (512 for the MIL-NCE ckpt)
    model = S3D(num_classes=int(text_params["fc2"]["kernel"].shape[1]))
    sample = next(iter(train_loader))
    trainer = S3DTrainer(
        model, cfg, sample, text_params, iters_per_epoch=len(train_loader)
    )
    if cfg.pt_backbone:
        trainer.load_backbone(convert_s3d_state_dict(ckpt))
    if cfg.resume:
        trainer.load_checkpoint(cfg.resume, mode="resume")
    elif cfg.pretrain:
        trainer.load_checkpoint(cfg.pretrain, mode="pretrain")
    return trainer.fit(train_loader)


def run_htm_tan(cfg):
    """TAN init/cotrain on HowTo100M features (reference train/main.py).

    Expected --data_root layout:
      howto100m_s3d_features/*.mp4.npy         per-second S3D features
      sentencified_htm_<tag>.json              ASR sentences ({vid: {...}})
      htm_holdout_vid.txt, htm_vlen.csv        filters (optional)
      s3d_dict.npy + s3d_howto100m.pth         word2vec tokenizer + tower
      htm_align.json (optional)                in-loop HTM-Align eval
    """
    import os

    import jax
    import numpy as np

    from exoground_tpu.data import ShardedSampler, ThreadedLoader
    from exoground_tpu.data.htm import HTMAlignDataset, HTMConfig, HTMFeatureDataset
    from exoground_tpu.models.word2vec import Word2VecModel, Word2VecTokenizer
    from exoground_tpu.train.trainer import TANTrainer
    from exoground_tpu.utils.convert import (
        convert_word2vec_from_s3d,
        load_torch_checkpoint,
    )

    root = cfg.data_root
    tokenizer = Word2VecTokenizer.from_dict_file(
        os.path.join(root, "s3d_dict.npy")
    )
    w2v_params = convert_word2vec_from_s3d(
        load_torch_checkpoint(os.path.join(root, "s3d_howto100m.pth"))
    )
    text_tower = Word2VecModel(w2v_params)

    tag = cfg.dataset.split("-")[-1] if "-" in cfg.dataset else "370k"
    dcfg = HTMConfig(
        video_feature_root=os.path.join(root, "howto100m_s3d_features"),
        asr_json=os.path.join(root, f"sentencified_htm_{tag}.json"),
        holdout_file=os.path.join(root, "htm_holdout_vid.txt"),
        vlen_csv=os.path.join(root, "htm_vlen.csv"),
        duration=cfg.seq_len, seed=cfg.seed,
    )
    train_ds = HTMFeatureDataset(dcfg, tokenizer, mode="train")
    val_ds = HTMFeatureDataset(dcfg, tokenizer, mode="val")
    shards, shard = jax.process_count(), jax.process_index()
    train_loader = ThreadedLoader(
        train_ds, cfg.batch_size,
        sampler=ShardedSampler(len(train_ds), shards, shard, seed=cfg.seed),
        num_workers=cfg.num_workers,
    )
    val_loader = ThreadedLoader(
        val_ds, cfg.batch_size,
        sampler=ShardedSampler(len(val_ds), shards, shard, shuffle=False),
        num_workers=cfg.num_workers, drop_last=False,
    )

    model = build_model(cfg)
    sample = next(iter(train_loader))
    trainer = TANTrainer(
        model, cfg, sample, text_tower=text_tower,
        iters_per_epoch=len(train_loader),
    )
    if cfg.resume:
        trainer.load_checkpoint(cfg.resume, mode="resume")
    elif cfg.pretrain:
        trainer.load_checkpoint(cfg.pretrain, mode="pretrain")

    downstream = None
    align_json = os.path.join(root, "htm_align.json")
    if os.path.exists(align_json):
        from exoground_tpu.evals import AlignEvalConfig, FusedAlignEvaluator

        import json as _json

        with open(align_json) as f:
            align_anno = _json.load(f)
        align_ds = HTMAlignDataset(
            dcfg, tokenizer=tokenizer, mode="full", anno=align_anno,
            store=train_ds.store,
        )

        def embed(texts):
            # pad tokens masked exactly like the in-step tower
            # (parallel/train_step.py:_batch_text) so eval embeddings match
            # the ones the model trains against
            tok = tokenizer(texts)
            ids = np.asarray(tok["input_ids"])
            return np.asarray(
                text_tower(ids, attention_mask=(ids != 0).astype(np.int32))[
                    "pooler_output"
                ]
            )

        align_items = []
        for i in range(len(align_ds)):
            it = align_ds[i]
            it["text_embed"] = embed(it["text"])
            align_items.append(it)
        evaluator_box = {}

        def downstream(tr):
            import jax

            # one evaluator for the whole run: compiled shape buckets are
            # reused; only the param snapshot refreshes per eval
            if "ev" not in evaluator_box:
                evaluator_box["ev"] = FusedAlignEvaluator(
                    tr.model, {"params": tr.params},
                    AlignEvalConfig(
                        seq_len=cfg.seq_len,
                        use_alignability_head=bool(cfg.use_alignability_head),
                        # in-loop eval rides every DP chip (round-robin
                        # video groups; clamped to the devices that exist)
                        eval_devices=cfg.dp_devices or len(jax.devices()),
                    ),
                )
            else:
                evaluator_box["ev"].update_params({"params": tr.params})
            return evaluator_box["ev"](align_items)

    if cfg.test:
        trainer.load_checkpoint(cfg.test, mode="test")
        res = downstream(trainer) if downstream else {"val_loss": trainer.evaluate(val_loader, 0)}
        print(res)
        return res
    return trainer.fit(train_loader, val_loader, downstream_eval=downstream)


if __name__ == "__main__":
    main()
