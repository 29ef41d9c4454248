"""masg_tpu — TPU-native mid-attribute speaker generation TTS framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
sarulab-speech/Mid-Attribute-Speaker-Generation (FastSpeech2 + TacoSpawn-style
GMM speaker prior + GE2E language discriminator + HiFi-GAN vocoder +
Wasserstein mid-attribute speaker distributions).

Layers (bottom-up):
  core/           typed config tree, RNG, checkpointing
  parallel/       device mesh + sharding rules (dp x tp), collectives via pjit
  ops/            compute kernels: masks, positional encodings, length
                  regulator (vectorized gather), attention (XLA + Pallas)
  models/         flax.linen model zoo: FastSpeech2, SpeakerMetaEncoder,
                  GE2E SpeechEmbedder, JDIT, HiFi-GAN, losses
  distributions/  diagonal-GMM Wasserstein machinery (interpolate/barycenter)
  audio/          jit-compiled STFT/mel feature pipeline, DIO+StoneMask F0
  text/           symbol inventory, text_to_sequence, accent ids, G2P adapters
  data/           host-side dataset + length-bucketed batching
  preprocessor/   offline corpus -> features pipeline (TextGrid alignment)
  train/          jitted train/eval steps, Noam optimizer, training loop
  infer/          synthesis entry points + vocoder inference
"""

__version__ = "0.1.0"
