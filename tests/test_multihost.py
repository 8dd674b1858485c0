"""Real 2-process jax.distributed execution (reference torchrun parity).

The reference's canonical trainer runs multi-process DDP
(main_egoexo4d_distributed.py:364-400 env-rank rendezvous; 8x8 SLURM,
train/train_grounding.sh:6-12). This spawns 2 CPU processes x 4 virtual
devices with a local Gloo coordinator and runs the REAL TANTrainer epoch +
sharded eval + chief-gated checkpoint/log writes + the addressable-shard
eval gather (trainer.py::BaseTrainer._local_eval_rows), asserting parity
with the identical single-process 8-device run.
"""

import pytest

pytestmark = pytest.mark.slow  # spawns 3 subprocesses, compile-heavy

from exoground_tpu.parallel.multihost_check import assert_parity, launch_check


def test_two_process_trainer_matches_single_process(tmp_path):
    res = launch_check(str(tmp_path), timeout=840.0)
    assert_parity(res)
    # both processes saw the distributed world
    for r in res["multi"]:
        assert r["num_processes"] == 2
        assert r["iteration"] == 2  # two optimizer steps ran
    assert res["single"]["num_processes"] == 1
