from .schedulers import (
    SchedulerConfig,
    DDPMSchedule,
    DPMSolverSchedule,
    make_ddpm,
    make_dpm_solver,
)
