from .stylegan2 import (
    FullyConnectedLayer,
    Conv2dLayer,
    MappingNetwork,
    SynthesisLayer,
    ToRGBLayer,
    SynthesisBlock,
    SynthesisNetwork,
    Generator,
)
from .superresolution import make_superresolution
from .triplane import TriPlaneGenerator, OSGDecoder
