"""genrl_tpu — a TPU-native multimodal-foundation world-model RL framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of mazpie/genrl:
DreamerV3-style world models, GenRL connector/aligner for language/video-prompted
behavior learning in imagination, InternVideo2-style video-language embedding,
replay, environments, and training CLIs — designed SPMD-first for TPU meshes.

Layout (mirrors the reference's layer map, see SURVEY.md):
  ops/       pure-JAX math, distributions, normalizers + Pallas kernels
  models/    model library: RSSM, encoder/decoder, MLP heads, connector, aligner,
             InternVideo2 (JAX ViT + BERT)
  agents/    DreamerAgent / GenRLAgent / Plan2Explore as jitted train steps
  rewards/   reward-plugin registry (env_reward, video_text_reward, ...)
  data/      NPZ episode replay with prefetching device feed
  parallel/  mesh construction and sharding rules
  envs/      dm_control wrapper stack + custom domains
  utils/     config system, logger, schedules, checkpointing
"""

__version__ = "0.1.0"
