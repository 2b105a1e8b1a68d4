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
from .stylegan3 import (
    Generator3,
    SynthesisInput3,
    SynthesisLayer3,
    SynthesisNetwork3,
)
from .triplane import TriPlaneGenerator, OSGDecoder
