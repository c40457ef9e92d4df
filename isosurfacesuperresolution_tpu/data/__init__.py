from isosurfacesuperresolution_tpu.data.generation import (
    SequenceConfig, random_camera_path, render_sequence, generate_sequences)
from isosurfacesuperresolution_tpu.data.dataset import (
    VideoDataset, DatasetFromSamples, Sample, augment_clip,
    load_reference_npy_dir)
