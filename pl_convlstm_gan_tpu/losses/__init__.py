from .combined import (CombinedLoss, combined_loss, point_supervision_loss,
                       point_supervision_sums, conservation_loss, gradient_loss,
                       temporal_consistency_loss, compute_sample_weights,
                       station_rmse, station_sq_err_sums, prepare_station_batch)
from .adversarial import (bce_with_logits, discriminator_loss, generator_adversarial_loss,
                          gan_generator_loss, l1_loss, l2_loss)
from .ssim import ssim, ssim_per_sample
from .metrics import (categorical_scores, contingency_counts, nowcast_scores,
                      scores_from_counts)

__all__ = [
    "CombinedLoss", "combined_loss", "point_supervision_loss",
    "point_supervision_sums", "conservation_loss", "gradient_loss",
    "temporal_consistency_loss", "compute_sample_weights",
    "station_rmse", "station_sq_err_sums", "prepare_station_batch",
    "bce_with_logits", "discriminator_loss", "generator_adversarial_loss",
    "gan_generator_loss", "l1_loss", "l2_loss", "ssim", "ssim_per_sample",
    "categorical_scores", "contingency_counts", "nowcast_scores",
    "scores_from_counts",
]
