"""Material classification from MTL channels.

Reproduces the reference's decision tree over the smuggled MTL channels
(reference: renderer/Renderer.mm:278-329): ``Kd`` = diffuse, ``Ka`` = emission,
``Ks`` = (roughness, metalness, +-ior):

  * metalness > 0 and roughness == 0          -> MIRROR
    (metalness > 0, roughness != 0            -> rough conductor TODO in the
     reference; it leaves materialType unset — we classify as MIRROR-less
     DIFFUSE fallback and warn)
  * roughness == 1                            -> DIFFUSE
  * ior <= 0   (ior := abs(ior))              -> SMOOTH_PLASTIC (roughness==0)
                                                 else DIFFUSE (rough plastic TODO)
  * ior > 0                                   -> SMOOTH_DIELECTRIC (roughness==0)
                                                 else DIFFUSE (rough dielectric TODO)
"""

from __future__ import annotations

import dataclasses
import logging

import numpy as np

from ..models.bsdf import (
    MATERIAL_DIFFUSE,
    MATERIAL_MIRROR,
    MATERIAL_NAMES,
    MATERIAL_SMOOTH_DIELECTRIC,
    MATERIAL_SMOOTH_PLASTIC,
)
from .objmtl import MtlRecord

log = logging.getLogger(__name__)


@dataclasses.dataclass
class MaterialTable:
    diffuse: np.ndarray    # (M, 3) float32
    emissive: np.ndarray   # (M, 3) float32
    ior: np.ndarray        # (M,) float32
    mtype: np.ndarray      # (M,) int32


def classify(records: list[MtlRecord]) -> MaterialTable:
    count = len(records)
    diffuse = np.zeros((count, 3), np.float32)
    emissive = np.zeros((count, 3), np.float32)
    ior = np.zeros(count, np.float32)
    mtype = np.zeros(count, np.int32)

    for i, rec in enumerate(records):
        diffuse[i] = rec.kd
        emissive[i] = rec.ka
        roughness, metalness, raw_ior = rec.ks
        ior[i] = raw_ior
        if metalness > 0.0:
            if roughness == 0.0:
                mtype[i] = MATERIAL_MIRROR
            else:
                # rough conductor: unimplemented in the reference too
                # (renderer/Renderer.mm:305 leaves the type unset -> 0 = diffuse)
                mtype[i] = MATERIAL_DIFFUSE
                log.warning("material %r: rough conductor unsupported -> diffuse", rec.name)
        elif roughness == 1.0:
            mtype[i] = MATERIAL_DIFFUSE
        elif raw_ior <= 0.0:
            ior[i] = abs(raw_ior)
            mtype[i] = (
                MATERIAL_SMOOTH_PLASTIC if roughness == 0.0 else MATERIAL_DIFFUSE
            )
        else:
            mtype[i] = (
                MATERIAL_SMOOTH_DIELECTRIC if roughness == 0.0 else MATERIAL_DIFFUSE
            )
        log.info("material %r -> %s", rec.name, MATERIAL_NAMES[mtype[i]])

    return MaterialTable(diffuse=diffuse, emissive=emissive, ior=ior, mtype=mtype)
