"""TPU-native music (piano timbre) style-transfer framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
silburt/ML_Music_Style_Transfer: MusicNet curation, MIDI+audio preprocessing,
dual-encoder PerformanceNet training, and Griffin-Lim synthesis — designed
for TPU (pjit/mesh sharding, on-device DSP, static shapes) rather than ported.
"""

__version__ = "0.1.0"
