from exoground_tpu.train.optim import make_optimizer, warmup_cosine_schedule
