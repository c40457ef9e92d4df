#!/bin/bash
# 512^3-volume training demo (VERDICT round-1 next-step #4):
# 1) synthesize a 512^3 ejecta volume as a RAW UCHAR .dat dataset
#    (the reference's ExternalImporter format), 2) import it through the
#    native C++ loader with uint8 HBM storage, 3) render clips with the
#    tiled Pallas sweep and train on them.
set -e
cd "$(dirname "$0")/.."
# round-end control: a queue tail can be retargeted without editing a
# jobfile a running driver is sourcing (bash reads those incrementally)
if [ -f /tmp/skip_train512 ]; then
  echo "train_512: /tmp/skip_train512 present; skipping"
  exit 0
fi
python - <<'PY'
import numpy as np, os
from isosurfacesuperresolution_tpu.volume import analytic
os.makedirs('/tmp/isosr_vol512', exist_ok=True)
g = analytic.ejecta_volume(512, num_particles=2500, seed=11)
v = np.asarray(g.dequant(g.values))
raw = np.clip(v * 255.0 + 0.5, 0, 255).astype(np.uint8)
raw.tofile('/tmp/isosr_vol512/ejecta512.raw')
with open('/tmp/isosr_vol512/ejecta512.dat', 'w') as f:
    f.write('ObjectFileName: ejecta512.raw\n')
    f.write('Resolution: 512 512 512\n')
    f.write('Format: UCHAR\n')
print('wrote /tmp/isosr_vol512/ejecta512.dat', raw.shape, raw.dtype,
      'occupancy', float((v >= 0.4).mean()))
PY
python -m isosurfacesuperresolution_tpu.apps.main_video_unshaded \
  --dataset /tmp/isosr_vol512/ejecta512.dat --numberOfImages 12 \
  --cacheDataset /tmp/isosr_clips_512 \
  --batchSize 8 --remat --dataDtype bfloat16 --samples 600 \
  --volumeDtype uint8 --epochs "${EPOCHS:-25}" --gradClip 1.0 "$@"
