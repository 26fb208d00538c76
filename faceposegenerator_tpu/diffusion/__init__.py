from .schedulers import (
    SchedulerConfig,
    DDPMSchedule,
    DPMSolverSchedule,
    make_ddpm,
    make_dpm_solver,
)
from .parallel_sampler import sample_parallel
