from eyoc_tpu.registration.sc2pcr import SC2PCRConfig, sc2_pcr, sc2_pcr_estimator
from eyoc_tpu.registration.ransac import RansacConfig, ransac_registration
