from sea_tpu.rollout.engine import (rollout, rollout_jit,  # noqa: F401
                                    rollout_prefix_recompute, rollout_scan)
