from .encoder import EncoderCostVolume360
from .decoder import DecoderSplatting
from .types import Gaussians
