from cover_vla_tpu.training import optim, train_pi0, train_pi0fast
