from stgcn_tpu.data.augmentation import augment_sequence, make_augmenter, sample_transform
from stgcn_tpu.data.collate import (
    batches,
    bucket_length,
    collate,
    default_buckets,
    native_batches,
    wrap_pad,
)
from stgcn_tpu.data.datasets import MetadataSplitter, SkeletonDataset
from stgcn_tpu.data.distances import calculate_distances, calculate_distances_from_dir
from stgcn_tpu.data.synthetic import generate_dataset, random_batch, synth_sequence
