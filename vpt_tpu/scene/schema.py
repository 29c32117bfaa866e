"""Host-side scene model.

Mirrors the reference `scene_data` containers
(/root/reference/libs/yocto/yocto_scene.h:221-249) as plain Python/numpy
dataclasses. This is the mutable, load-time representation; the device-side
SoA representation lives in vpt_tpu.scene.flatten.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

INVALID = -1

# material type codes (must match vpt_tpu.ops.bsdf constants / yocto enum order)
MATERIAL_TYPES = [
    "matte", "glossy", "reflective", "transparent", "refractive",
    "subsurface", "volumetric", "gltfpbr",
]

SDF_TYPES = ["bbox", "box", "capped_cone", "plane", "sphere", "torus"]


@dataclass
class Camera:
    frame: np.ndarray = None  # (4,3)
    orthographic: bool = False
    lens: float = 0.050
    film: float = 0.036
    aspect: float = 1.5
    focus: float = 10000.0
    aperture: float = 0.0
    name: str = ""


@dataclass
class Texture:
    width: int = 0
    height: int = 0
    linear: bool = False  # True for HDR (float) textures
    pixels: np.ndarray = None  # (H, W, 4) float32, raw (srgb-encoded when not linear)
    name: str = ""


@dataclass
class Material:
    type: int = 0  # index into MATERIAL_TYPES
    emission: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    color: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    roughness: float = 0.0
    metallic: float = 0.0
    ior: float = 1.5
    scattering: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    scanisotropy: float = 0.0
    trdepth: float = 0.01
    opacity: float = 1.0
    emission_tex: int = INVALID
    color_tex: int = INVALID
    roughness_tex: int = INVALID
    scattering_tex: int = INVALID
    normal_tex: int = INVALID
    name: str = ""


@dataclass
class Shape:
    positions: np.ndarray = None   # (V,3)
    normals: np.ndarray = None     # (V,3) | None
    texcoords: np.ndarray = None   # (V,2) | None
    colors: np.ndarray = None      # (V,4) | None
    radius: np.ndarray = None      # (V,) per-vertex radius (lines/points)
    triangles: np.ndarray = None   # (T,3) i32 | None
    quads: np.ndarray = None       # (Q,4) i32 | None
    lines: np.ndarray = None       # (L,2) i32 | None
    points: np.ndarray = None      # (P,) i32 | None
    name: str = ""


@dataclass
class Instance:
    frame: np.ndarray = None  # (4,3)
    shape: int = INVALID
    material: int = INVALID
    name: str = ""


@dataclass
class Environment:
    frame: np.ndarray = None
    emission: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    emission_tex: int = INVALID
    name: str = ""


@dataclass
class Subdiv:
    quadspos: np.ndarray = None
    quadsnorm: np.ndarray = None
    quadstexcoord: np.ndarray = None
    positions: np.ndarray = None
    normals: np.ndarray = None
    texcoords: np.ndarray = None
    subdivisions: int = 0
    catmullclark: bool = True
    smooth: bool = True
    displacement: float = 0.0
    displacement_tex: int = INVALID
    shape: int = INVALID
    name: str = ""


@dataclass
class VolumeGrid:
    whd: np.ndarray = None     # (3,) int
    values: np.ndarray = None  # (D,H,W) float32 indexed [z,y,x]
    res: float = 1.0
    name: str = ""


@dataclass
class VolInstance:
    volume: int = INVALID
    material: int = INVALID
    scalef: float = 1.0
    frame: np.ndarray = None
    name: str = ""


@dataclass
class Sdf:
    """Analytic SDF: type + params; mirrors sdf_data (yocto_scene.h:194-200)
    but stores the primitive parameters instead of a closure so it can be
    evaluated branchlessly on device. params layout per type:
      bbox: (whd.x, whd.y, whd.z, thickness)
      box: (whd/2 centered handled at eval; params = whd)
      capped_cone: (height, r1, r2, 0)
      plane: ()
      sphere: (radius,)
      torus: (r1, r2)
    """

    type: int = 0
    params: np.ndarray = field(default_factory=lambda: np.zeros(4, np.float32))
    whd: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    frame: np.ndarray = None
    material: int = INVALID
    name: str = ""


@dataclass
class HostScene:
    cameras: list = field(default_factory=list)
    textures: list = field(default_factory=list)
    materials: list = field(default_factory=list)
    shapes: list = field(default_factory=list)
    instances: list = field(default_factory=list)
    environments: list = field(default_factory=list)
    subdivs: list = field(default_factory=list)
    volumes: list = field(default_factory=list)
    vol_instances: list = field(default_factory=list)
    sdfs: list = field(default_factory=list)
    copyright: str = ""
