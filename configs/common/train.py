# Common training options for tools/lazyconfig_train_net.py (reference
# configs/common/train.py). No device/DDP/AMP blocks: one jit program over
# the mesh; precision comes from the model's dtype field.
train = dict(
    output_dir="./output",
    init_checkpoint="",
    max_iter=90000,
    checkpoint_period=5000,
    eval_period=5000,
    log_period=20,
    seed=0,
    mesh_shape=(-1,),  # all visible devices on one data axis
)
