from . import augment, collate, kaldi_io, native_loader, simulate
from .dataset import KaldiTSDataset
