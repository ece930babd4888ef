"""Config shared by tests/test_distributed.py and tests/_dist_worker.py —
one definition so the 2-process run and the single-process reference are
guaranteed to train the same model on the same data."""

from uresnet_tpu.config import (Config, DataConfig, ModelConfig, OptimConfig,
                                TrainConfig)

ITERATIONS = 4
SUMMARY_ITER = 2


def dist_config(usef: str, outdir: str) -> Config:
    import os

    return Config(
        model=ModelConfig(dims=2, num_class=3, base_filters=4, depth=2,
                          compute_dtype="float32", pack=False),
        data=DataConfig(image_size=64, batch_size=8, planes=(0,),
                        input_files=(usef,), synthetic=False,
                        random_access=False, transfer="sparse",
                        max_points=512, weight_mode="class_balance",
                        backend="python", augment=False, num_threads=1,
                        prefetch_depth=1),
        optim=OptimConfig(lr=1e-3, schedule="constant"),
        train=TrainConfig(iterations=ITERATIONS, summary_iter=SUMMARY_ITER,
                          checkpoint_iter=ITERATIONS, val_iter=0, seed=3,
                          preempt_save=False,
                          checkpoint_dir=os.path.join(outdir, "ckpt"),
                          log_dir=os.path.join(outdir, "log")),
    )
