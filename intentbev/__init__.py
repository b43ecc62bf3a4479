"""intentbev — TPU-native BEV detection + intention prediction framework.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of
Nadeem202020/VisionTransformer-Intention-Prediction (IntentNet on Argoverse 2
with CNN and ViT backbones). See SURVEY.md for the blueprint.
"""

from . import configs

__version__ = "0.1.0"
