from .activations import ComplexReLU, ComplexActivation, complex_relu, magnitude_preserving_silu
from .layers import Conv1x1, MLP, EncoderDecoder, DropPath, LayerScale, PatchEmbed2D, PatchRecovery2D
from .layer_norm import InstanceNorm2d, GeometricInstanceNormS2, ChannelLayerNorm
from .spectral_convolution import SpectralConv, SpectralAttention
