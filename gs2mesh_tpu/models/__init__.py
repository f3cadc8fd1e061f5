from gs2mesh_tpu.models.gaussians import GaussianModel, GaussianParams
