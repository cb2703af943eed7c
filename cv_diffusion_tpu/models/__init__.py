from .unet import (EfficientUNet, create_efficient_unet, init_unet,
                   count_params, memory_footprint)
from .scheduler import (LCMSchedule, make_schedule, lcm_timesteps,
                        prev_timesteps, add_noise, get_velocity, step,
                        ddim_step, pred_original_sample,
                        timestep_scan_arrays)
from .diffusion import (LowLightDiffusion, create_model, init_model,
                        train_forward, compute_loss, diffusion_loss, enhance,
                        normalize_image, denormalize_image, get_model_size)
from .distillation import (DistillationState, create_distillation_state,
                           make_distillation_step,
                           make_regression_distillation_step,
                           consistency_distillation_loss, consistency_loss,
                           huber_loss, sample_timestep_pairs,
                           sampler_regression_loss)
from .diffusion import EnhanceOutput
