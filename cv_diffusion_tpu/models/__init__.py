from .unet import (EfficientUNet, create_efficient_unet, init_unet,
                   count_params, memory_footprint)
from .scheduler import (LCMSchedule, make_schedule, lcm_timesteps,
                        prev_timesteps, add_noise, get_velocity, step,
                        pred_original_sample, timestep_scan_arrays)
