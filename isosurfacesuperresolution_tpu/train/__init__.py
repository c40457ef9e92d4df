from isosurfacesuperresolution_tpu.train.trainer import (
    TrainState, make_train_step, make_eval_step, make_adv_train_steps,
    make_optimizer, create_train_state, clamp_output, epoch_learning_rate)
from isosurfacesuperresolution_tpu.train.checkpoint import (
    CheckpointManager, next_run_dir, write_info, save_params_npz,
    load_params_npz)
