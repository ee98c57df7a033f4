from .functions import weighted_rmse, weighted_acc, weighted_l1, ensemble_crps, ensemble_spread
