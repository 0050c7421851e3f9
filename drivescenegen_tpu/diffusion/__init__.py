from drivescenegen_tpu.diffusion.schedule import (  # noqa: F401
    DiffusionSchedule,
    make_schedule,
)
from drivescenegen_tpu.diffusion.samplers import (  # noqa: F401
    ddpm_sample,
    ddim_sample,
    dpmpp_2m_sample,
    dpmpp_2m_sde_sample,
    ddpm_timesteps,
    ddim_timesteps,
)
