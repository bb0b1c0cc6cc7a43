from tpusr.train.trainer import SupervisedSRTrainer, ClassifierTrainer, TrainState, FitResult
from tpusr.train.gan import ESRGANTrainer, GANState, GANFitResult
from tpusr.train.callbacks import (
    EpochTimeTracker, EpochMemoryTracker, EarlyStopping, ReduceLROnPlateau,
)
from tpusr.train.checkpoint import (save_checkpoint, save_checkpoint_async,
                                    restore_checkpoint, load_metadata)
