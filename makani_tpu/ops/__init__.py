from .sht import RealSHT, InverseRealSHT
from .fft import RealFFT1, InverseRealFFT1, RealFFT2, InverseRealFFT2, RealFFT3, InverseRealFFT3
from .quadrature import (
    legendre_gauss_weights,
    lobatto_weights,
    clenshaw_curtiss_weights,
    precompute_latitudes,
)
from .legendre import precompute_legpoly
