from .base_loss import LossType, GeometricBaseLoss, SpectralBaseLoss, compute_channel_weighting
from .lp_loss import GeometricLpLoss, SpectralLpLoss, SpectralH1Loss
