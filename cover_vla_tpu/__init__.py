"""cover_vla_tpu — TPU-native verification-scaling VLA inference framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
cover-vla/cover-vla (see SURVEY.md): pi0 flow-matching policy
(PaliGemma-3B + Gemma action expert), SigLIP2 contrastive trajectory
verifier ensemble, and a fused on-device sample->score->select control
loop, plus training, serving, and evaluation subsystems.
"""

__version__ = "0.1.0"
