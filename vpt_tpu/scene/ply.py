"""PLY mesh loader (ascii + binary little/big endian), numpy-based.

Covers the subset the reference relies on via its own PLY parser
(/root/reference/libs/yocto/yocto_modelio.cpp:104+): vertex
position/normal/uv/color/radius properties and triangle/quad face lists.
Implemented from the PLY spec, vectorized with numpy for speed on the large
bunny meshes.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

_PLY_DTYPES = {
    "char": "i1", "int8": "i1",
    "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2",
    "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4",
    "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4",
    "double": "f8", "float64": "f8",
}


@dataclass
class PlyElement:
    name: str
    count: int
    # list of (prop_name, dtype_str) or (prop_name, (count_dtype, item_dtype))
    properties: list = field(default_factory=list)


def _parse_header(data: bytes):
    end = data.find(b"end_header")
    if end < 0:
        raise ValueError("not a PLY file: missing end_header")
    header = data[:end].decode("ascii", errors="replace")
    body_start = data.find(b"\n", end) + 1
    fmt = None
    elements: list[PlyElement] = []
    for line in header.splitlines():
        parts = line.strip().split()
        if not parts:
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element":
            elements.append(PlyElement(parts[1], int(parts[2])))
        elif parts[0] == "property":
            if parts[1] == "list":
                elements[-1].properties.append(
                    (parts[4], (_PLY_DTYPES[parts[2]], _PLY_DTYPES[parts[3]]))
                )
            else:
                elements[-1].properties.append((parts[2], _PLY_DTYPES[parts[1]]))
    return fmt, elements, body_start


def _read_binary_element(buf, offset, elem: PlyElement, endian):
    # fixed-size fast path
    if all(not isinstance(d, tuple) for _, d in elem.properties):
        dt = np.dtype([(n, endian + d) for n, d in elem.properties])
        arr = np.frombuffer(buf, dtype=dt, count=elem.count, offset=offset)
        return arr, offset + dt.itemsize * elem.count
    # list properties: assume a single list property (face layout), uniform count
    if len(elem.properties) == 1 and isinstance(elem.properties[0][1], tuple):
        cnt_d, item_d = elem.properties[0][1]
        cnt_dt = np.dtype(endian + cnt_d)
        item_dt = np.dtype(endian + item_d)
        first = int(np.frombuffer(buf, dtype=cnt_dt, count=1, offset=offset)[0])
        rec = np.dtype([("n", endian + cnt_d), ("v", endian + item_d, (first,))])
        arr = np.frombuffer(buf, dtype=rec, count=elem.count, offset=offset)
        if not (arr["n"] == first).all():
            # mixed face sizes: slow path
            return _read_binary_mixed(buf, offset, elem, endian)
        return {"indices": arr["v"].astype(np.int64)}, offset + rec.itemsize * elem.count
    raise ValueError(f"unsupported PLY element layout: {elem.properties}")


def _read_binary_mixed(buf, offset, elem, endian):
    faces = []
    cnt_d, item_d = elem.properties[0][1]
    cnt_dt = np.dtype(endian + cnt_d)
    item_dt = np.dtype(endian + item_d)
    for _ in range(elem.count):
        n = int(np.frombuffer(buf, dtype=cnt_dt, count=1, offset=offset)[0])
        offset += cnt_dt.itemsize
        faces.append(np.frombuffer(buf, dtype=item_dt, count=n, offset=offset).astype(np.int64))
        offset += item_dt.itemsize * n
    return {"faces_list": faces}, offset


def load_ply(path: str):
    """Returns dict with keys: positions (V,3) f32, normals, texcoords, colors,
    radius (optional), triangles (T,3) i32, quads (Q,4) i32."""
    with open(path, "rb") as f:
        data = f.read()
    fmt, elements, body = _parse_header(data)
    out = {}
    vert_arrays = {}
    faces = None
    lines = points = None
    if fmt in ("binary_little_endian", "binary_big_endian"):
        endian = "<" if fmt == "binary_little_endian" else ">"
        offset = body
        for elem in elements:
            arr, offset = _read_binary_element(data, offset, elem, endian)
            if elem.name == "vertex":
                vert_arrays = {n: np.asarray(arr[n]) for n, _ in elem.properties}
            elif elem.name == "face":
                faces = arr
            elif elem.name == "line" and "indices" in arr:
                lines = arr["indices"].astype(np.int32)
            elif elem.name == "point" and "indices" in arr:
                points = arr["indices"].astype(np.int32).reshape(-1)
    elif fmt == "ascii":
        text = data[body:].decode("ascii").split()
        pos = 0
        for elem in elements:
            if all(not isinstance(d, tuple) for _, d in elem.properties):
                ncols = len(elem.properties)
                vals = np.array(text[pos:pos + elem.count * ncols], dtype=np.float64)
                vals = vals.reshape(elem.count, ncols)
                pos += elem.count * ncols
                if elem.name == "vertex":
                    vert_arrays = {
                        n: vals[:, i] for i, (n, _) in enumerate(elem.properties)
                    }
            else:
                faces_list = []
                for _ in range(elem.count):
                    n = int(text[pos]); pos += 1
                    faces_list.append([int(x) for x in text[pos:pos + n]])
                    pos += n
                if elem.name == "face":
                    sizes = {len(f) for f in faces_list}
                    if sizes <= {3}:
                        faces = {"indices": np.array(faces_list, dtype=np.int64)}
                    elif sizes <= {4}:
                        faces = {"indices": np.array(faces_list, dtype=np.int64)}
                    else:
                        faces = {"faces_list": [np.array(f) for f in faces_list]}
    else:
        raise ValueError(f"unknown PLY format {fmt}")

    def stack(names, dtype=np.float32):
        if all(n in vert_arrays for n in names):
            return np.stack([vert_arrays[n] for n in names], axis=-1).astype(dtype)
        return None

    out["positions"] = stack(["x", "y", "z"])
    out["normals"] = stack(["nx", "ny", "nz"])
    uv = stack(["u", "v"]) if "u" in vert_arrays else stack(["s", "t"])
    out["texcoords"] = uv
    if "red" in vert_arrays:
        cols = stack(["red", "green", "blue"], np.float32)
        if vert_arrays["red"].dtype == np.uint8 or cols.max() > 1.5:
            cols = cols / 255.0
        alpha = vert_arrays.get("alpha")
        if alpha is not None:
            a = alpha.astype(np.float32)
            if a.max() > 1.5:
                a = a / 255.0
        else:
            a = np.ones(cols.shape[0], np.float32)
        out["colors"] = np.concatenate([cols, a[:, None]], axis=-1)
    else:
        out["colors"] = None
    out["radius"] = vert_arrays.get("radius")
    if lines is not None:
        out["lines"] = lines
    if points is not None:
        out["points"] = points

    out["triangles"] = None
    out["quads"] = None
    if faces is not None:
        if "indices" in faces:
            idx = faces["indices"]
            if idx.shape[1] == 3:
                out["triangles"] = idx.astype(np.int32)
            elif idx.shape[1] == 4:
                out["quads"] = idx.astype(np.int32)
        else:
            tris, quads = [], []
            for f in faces["faces_list"]:
                if len(f) == 3:
                    tris.append(f)
                elif len(f) == 4:
                    quads.append(f)
                else:  # fan-triangulate
                    for i in range(1, len(f) - 1):
                        tris.append([f[0], f[i], f[i + 1]])
            if tris:
                out["triangles"] = np.array(tris, dtype=np.int32)
            if quads:
                out["quads"] = np.array(quads, dtype=np.int32)
    return out


def load_ply_frames(path: str) -> list:
    """Instance frames from a PLY 'instance' element with properties
    xx xy xz yx yy yz zx zy zz ox oy oz (reference load_instance,
    yocto_sceneio.cpp:2790-2808). Returns a list of (4,3) float32 frames."""
    with open(path, "rb") as f:
        data = f.read()
    fmt, elements, body = _parse_header(data)
    names = ["xx", "xy", "xz", "yx", "yy", "yz", "zx", "zy", "zz",
             "ox", "oy", "oz"]
    for elem in elements:
        if elem.name != "instance":
            continue
        if fmt.startswith("binary"):
            endian = "<" if fmt == "binary_little_endian" else ">"
            offset = body
            for e2 in elements:
                arr, offset = _read_binary_element(data, offset, e2, endian)
                if e2.name == "instance":
                    cols = {n: np.asarray(arr[n]) for n, _ in e2.properties}
                    break
        else:
            text = data[body:].decode("ascii").split()
            ncols = len(elem.properties)
            vals = np.array(text[:elem.count * ncols], np.float64)
            vals = vals.reshape(elem.count, ncols)
            cols = {n: vals[:, i] for i, (n, _) in enumerate(elem.properties)}
        mat = np.stack([cols[n] for n in names], axis=-1).astype(np.float32)
        return [m.reshape(4, 3) for m in mat]
    raise ValueError(f"{path}: no instance element")


def save_ply(path: str, shape: dict):
    """Write a shape dict (keys as returned by load_ply, plus optional
    lines (L,2) / points (P,)) as binary_little_endian PLY. Mirrors the
    reference save_shape PLY branch (yocto_sceneio.cpp:1028-1046): vertex
    x/y/z [+nx/ny/nz] [+u/v] [+red..alpha] [+radius], faces as uchar-count
    int lists (triangles and quads share the face element), lines as a
    'line' element, points as a 'point' element."""
    pos = np.asarray(shape["positions"], np.float32)
    V = pos.shape[0]
    cols = [("x", pos[:, 0]), ("y", pos[:, 1]), ("z", pos[:, 2])]
    if shape.get("normals") is not None:
        n = np.asarray(shape["normals"], np.float32)
        cols += [("nx", n[:, 0]), ("ny", n[:, 1]), ("nz", n[:, 2])]
    if shape.get("texcoords") is not None:
        t = np.asarray(shape["texcoords"], np.float32)
        cols += [("u", t[:, 0]), ("v", t[:, 1])]
    if shape.get("colors") is not None:
        c = np.asarray(shape["colors"], np.float32)
        if c.shape[1] == 3:
            c = np.concatenate([c, np.ones((V, 1), np.float32)], axis=1)
        cols += [("red", c[:, 0]), ("green", c[:, 1]), ("blue", c[:, 2]),
                 ("alpha", c[:, 3])]
    if shape.get("radius") is not None:
        cols += [("radius", np.asarray(shape["radius"], np.float32))]

    tris = shape.get("triangles")
    quads = shape.get("quads")
    lines = shape.get("lines")
    points = shape.get("points")
    nfaces = (0 if tris is None else len(tris)) + (
        0 if quads is None else len(quads))

    hdr = ["ply", "format binary_little_endian 1.0",
           "comment written by vpt_tpu",
           f"element vertex {V}"]
    hdr += [f"property float {name}" for name, _ in cols]
    if nfaces:
        hdr += [f"element face {nfaces}",
                "property list uchar int vertex_indices"]
    if lines is not None and len(lines):
        hdr += [f"element line {len(lines)}",
                "property list uchar int vertex_indices"]
    if points is not None and len(points):
        hdr += [f"element point {len(points)}",
                "property list uchar int vertex_indices"]
    hdr += ["end_header", ""]

    parts = ["\n".join(hdr).encode("ascii")]
    vert = np.stack([v.astype(np.float32) for _, v in cols], axis=-1)
    parts.append(vert.astype("<f4").tobytes())

    def list_block(idx, n):
        idx = np.asarray(idx, np.int32).reshape(-1, n)
        rec = np.zeros(idx.shape[0],
                       np.dtype([("n", "u1"), ("v", "<i4", (n,))]))
        rec["n"] = n
        rec["v"] = idx
        return rec.tobytes()

    if tris is not None and len(tris):
        parts.append(list_block(tris, 3))
    if quads is not None and len(quads):
        parts.append(list_block(quads, 4))
    if lines is not None and len(lines):
        parts.append(list_block(lines, 2))
    if points is not None and len(points):
        parts.append(list_block(np.asarray(points).reshape(-1, 1), 1))
    with open(path, "wb") as f:
        f.write(b"".join(parts))
