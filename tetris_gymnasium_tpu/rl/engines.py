"""Engine selection for the RL stacks: flagship (vmap) or turbo (batch-minor).

Every train loop in :mod:`tetris_gymnasium_tpu.rl` drives the env through the
same three batched callables; this module picks which engine provides them.

``impl="flagship"`` lifts the per-env flagship engine with ``vmap``
(batch-leading state, id boards — needed when training drives rendering or
Dict observations).  ``impl="turbo"`` uses the batch-minor bit-packed engine
(:mod:`tetris_gymnasium_tpu.core.turbo`) — trajectory-equivalent
(tests/test_turbo.py) and ~50x faster per env step, the right choice for
throughput training.  Both take per-env keys ``uint32[B, 2]`` and produce the
same board observation values, so a policy trained on one runs on the other.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax

from tetris_gymnasium_tpu.config import EngineConfig, RewardsMapping
from tetris_gymnasium_tpu.core import engine, turbo
from tetris_gymnasium_tpu.ops import image


def env_fns(
    env_config: EngineConfig,
    impl: str,
    rewards: Optional[RewardsMapping] = None,
    obs: str = "board",
    pieces=None,
) -> Tuple[Callable, Callable, Callable]:
    """(init, step, observe) batched over the env axis for the chosen engine.

    ``rewards`` overrides the default :class:`RewardsMapping` — the same
    shaping surface the reference exposes via its ``rewards_mapping``
    constructor kwarg (ref: envs/tetris.py:84, mappings/rewards.py:5-15);
    None keeps the engines' defaults.

    ``obs`` selects the observation the policy trains on:

    * ``"board"`` — the native ``int8 [B, H, W]`` board (stack 1, active -1).
    * ``"rgb84"`` — the reference CNN workload's exact preprocessing chain,
      fused on device: Dict obs -> RGB composite -> 84x84 INTER_AREA resize
      -> grayscale, ``uint8 [B, 84, 84]``
      (ref: examples/train_cnn.py:127-147; kernels in ops/image.py).
      Flagship engine only — the turbo engine's bit-packed rows carry no
      cell ids to colorize.
    """
    if obs not in ("board", "rgb84"):
        raise ValueError(f"unknown observation kind: {obs!r}")
    if obs == "rgb84" and impl != "flagship":
        raise ValueError(
            "obs='rgb84' needs the flagship engine (id boards for the RGB "
            "palette); the turbo engine stores binary rows only"
        )
    rkw = {} if rewards is None else {"rewards": rewards}
    pkw = {} if pieces is None else {"pieces": pieces}
    if impl == "turbo":
        init = functools.partial(turbo.init, config=env_config, **pkw)
        step = functools.partial(turbo.step, config=env_config, **rkw, **pkw)
        observe = functools.partial(turbo.observe_board, config=env_config, **pkw)
        return init, step, observe
    if impl != "flagship":
        raise ValueError(f"unknown engine impl: {impl!r}")
    init = jax.vmap(functools.partial(engine.init_state, config=env_config, **pkw))
    step = jax.vmap(
        functools.partial(
            engine.step, config=env_config, obs_fn=lambda s, c, p: (), **rkw, **pkw
        )
    )
    if obs == "rgb84":
        render = jax.vmap(
            functools.partial(engine.render_rgb, config=env_config, **pkw)
        )

        def observe(states):
            return image.preprocess_rgb84(render(states))

    else:
        observe = jax.vmap(
            functools.partial(engine.observe_board, config=env_config, **pkw)
        )
    return init, step, observe
