"""SfM track generation from pairwise feature matches (union-find).

Reference: gtsam/sfm/DsfTrackGenerator.{h,cpp} — merge (camera, feature-index)
pairs across match lists into tracks, dropping inconsistent tracks that see the
same camera twice.
"""

import dataclasses
from typing import Dict, List, Tuple

import numpy as np

from ..base.dsf import DSFMap


@dataclasses.dataclass
class SfmTrack2d:
    measurements: List[Tuple[int, np.ndarray]]  # (camera_idx, uv)


def tracks_from_pairwise_matches(
        matches: Dict[Tuple[int, int], np.ndarray],
        keypoints: Dict[int, np.ndarray]) -> List[SfmTrack2d]:
    """matches[(i, j)]: (K, 2) arrays of feature-index pairs between cameras
    i and j; keypoints[i]: (F_i, 2) pixel coords.  Returns consistent tracks."""
    dsf = DSFMap()
    for (i, j), m in matches.items():
        for (ki, kj) in np.asarray(m):
            dsf.merge((int(i), int(ki)), (int(j), int(kj)))
    tracks = []
    for _root, members in dsf.sets().items():
        cams = [c for (c, _f) in members]
        if len(set(cams)) != len(cams):
            continue  # inconsistent: same camera appears twice (reference drops)
        if len(members) < 2:
            continue
        ms = [(c, np.asarray(keypoints[c][f])) for (c, f) in sorted(members)]
        tracks.append(SfmTrack2d(ms))
    return tracks
