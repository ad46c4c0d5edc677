from .mast3r import Mast3rModel, TwoViewNet, PairPrediction
from .heads import DPTHead, DescriptorHead, postprocess_pointmap
from .vit import Encoder, InterleavedDecoder, patch_positions
