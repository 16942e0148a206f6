from f1tenth_gym_tpu.envs.gym_api import (
    F110Env,
    F110GymnasiumEnv,
    register_gymnasium,
)

register_gymnasium()

__all__ = ["F110Env", "F110GymnasiumEnv", "register_gymnasium"]
