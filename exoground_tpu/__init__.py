"""exoground_tpu — TPU-native video-text temporal alignment & grounding framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of TAN/ExoGround
(reference: arjunrs1/ExoGround): encoder/decoder transformers that temporally
align and ground narrations against long per-second video feature sequences,
trained with MIL-NCE / InfoNCE / IoU+L1 losses, evaluated zero-shot on
HTM-Align and YouCook2, and scaled with pjit data parallelism over a device
mesh.

Layout (mirrors the reference's layer map, SURVEY.md §1, rebuilt TPU-first):
  ops/       core compute: fused attention (Pallas flash + XLA reference),
             transformer blocks, positional embeddings, mask builders
  models/    TemporalAligner, ExoGroundingTransformer, GroundingModel,
             ViewInvariant encoders, word2vec text tower, S3D backbone
  losses/    MIL-NCE + agreement self-labelling, grounding IoU+L1,
             cross-view InfoNCE, alignability BCE
  data/      feature-window datasets (HTM, HTM-Align, YouCook2, EgoExo4D,
             LEMMA), curriculum + sharded sampling, collate semantics
  parallel/  device mesh, shard_map data-parallel train step, collectives
  train/     trainer loops, optimizer policies, LR schedules, checkpointing
  evals/     HTM-Align overlap-seq/global protocols, YC2 retrieval
  utils/     meters, torch-checkpoint conversion, logging
"""

__version__ = "0.1.0"
