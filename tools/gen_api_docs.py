"""Generate the markdown API reference under docs/api/.

Autodoc-style: introspects every public module of ``torchdrivesim_tpu`` and
emits one markdown file per module with class/function signatures and their
docstrings, plus an index. The reference ships a sphinx autodoc site
(`/root/reference/docs/source/index.md`, `conf.py`); this is the equivalent
surface listing without a sphinx build step.

Usage:  TDS_PLATFORM=cpu python tools/gen_api_docs.py
"""
import dataclasses
import importlib
import inspect
import pkgutil
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import torchdrivesim_tpu  # noqa: E402

OUT = ROOT / 'docs' / 'api'

#: modules that are internal plumbing, not public API
SKIP = {
    'torchdrivesim_tpu.native',   # build shim for the C++ map baker
}

#: one-line module summaries for the index (fallback: first docstring line)
SECTION_ORDER = [
    ('Core', ['simulator', 'kinematic', 'mesh', 'scene_mesh', 'utils']),
    ('Observation', ['rendering', 'rendering.base', 'rendering.jax_renderer',
                     'observation_noise']),
    ('Infractions & geometry', ['infractions', 'iou_utils', 'map_grids',
                                'ops.box', 'ops.collision', 'ops.point_mesh',
                                'ops.grids']),
    ('World state', ['traffic_controls', 'traffic_lights', 'goals']),
    ('Maps', ['map', 'lanelet2']),
    ('Behavior', ['behavior.replay', 'behavior.iai', 'behavior.heuristic',
                  'behavior.interaction', 'behavior.common']),
    ('TPU kernels', ['ops.rasterize', 'ops.pallas_rasterize',
                     'ops.pallas_fused', 'ops.pallas_warp',
                     'ops.pallas_soft']),
    ('Scaling & infrastructure', ['parallel', 'checkpoint', 'validation',
                                  'benchmark', 'models.policy']),
]


def _signature(obj):
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return '(...)'


def _clean_doc(doc, indent='  '):
    if not doc:
        return ''
    lines = inspect.cleandoc(doc).splitlines()
    return '\n'.join(indent + ln if ln.strip() else '' for ln in lines)


def _is_local(obj, module):
    mod = getattr(obj, '__module__', None)
    return mod == module.__name__


def _public_members(module):
    names = getattr(module, '__all__', None)
    if names is None:
        names = [n for n in vars(module) if not n.startswith('_')]
    out = []
    for n in names:
        obj = getattr(module, n, None)
        if obj is None or inspect.ismodule(obj):
            continue
        if inspect.isclass(obj) or callable(obj):
            if not _is_local(obj, module):
                continue
        elif not isinstance(obj, (int, float, str, tuple)):
            continue
        out.append((n, obj))
    return out


def _emit_class(name, cls, md):
    md.append(f'### class `{name}{_signature(cls)}`\n')
    doc = _clean_doc(cls.__doc__, indent='')
    if doc:
        md.append(doc + '\n')
    if dataclasses.is_dataclass(cls):
        md.append('**Fields:**\n')
        for f in dataclasses.fields(cls):
            tp = getattr(f.type, '__name__', f.type)
            default = ''
            if f.default is not dataclasses.MISSING:
                default = f' = `{f.default!r}`'
            elif f.default_factory is not dataclasses.MISSING:  # type: ignore
                default = ' = `<factory>`'
            md.append(f'- `{f.name}: {tp}`{default}')
        md.append('')
    methods = []
    for mn, m in sorted(vars(cls).items()):
        if mn.startswith('_') and mn != '__init__':
            continue
        if mn == '__init__' and dataclasses.is_dataclass(cls):
            continue  # the Fields listing above already covers it
        if isinstance(m, (staticmethod, classmethod)):
            m = m.__func__
        if isinstance(m, property):
            methods.append((mn, m.fget, '*property*'))
        elif inspect.isfunction(m):
            methods.append((mn, m, None))
    for mn, fn, tag in methods:
        sig = _signature(fn) if tag is None else ''
        tag_s = f' {tag}' if tag else ''
        md.append(f'#### `{name}.{mn}{sig}`{tag_s}\n')
        doc = _clean_doc(fn.__doc__, indent='')
        if doc:
            md.append(doc + '\n')


def emit_module(modname):
    module = importlib.import_module(modname)
    short = modname.replace('torchdrivesim_tpu.', '')
    md = [f'# `{modname}`\n']
    mdoc = _clean_doc(module.__doc__, indent='')
    if mdoc:
        md.append(mdoc + '\n')
    consts, funcs, classes = [], [], []
    for n, obj in _public_members(module):
        if inspect.isclass(obj):
            classes.append((n, obj))
        elif callable(obj):
            funcs.append((n, obj))
        else:
            consts.append((n, obj))
    if consts:
        md.append('## Constants\n')
        for n, v in consts:
            rep = repr(v)
            if len(rep) > 80:
                rep = rep[:77] + '...'
            md.append(f'- `{n} = {rep}`')
        md.append('')
    if classes:
        md.append('## Classes\n')
        for n, cls in classes:
            _emit_class(n, cls, md)
    if funcs:
        md.append('## Functions\n')
        for n, fn in funcs:
            md.append(f'### `{n}{_signature(fn)}`\n')
            doc = _clean_doc(fn.__doc__, indent='')
            if doc:
                md.append(doc + '\n')
    path = OUT / (short.replace('.', '_') + '.md')
    path.write_text('\n'.join(md) + '\n')
    first_line = (inspect.cleandoc(module.__doc__).splitlines()[0]
                  if module.__doc__ else '')
    return short, path.name, first_line


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    mods = ['torchdrivesim_tpu'] + sorted(
        m.name for m in pkgutil.walk_packages(
            torchdrivesim_tpu.__path__, 'torchdrivesim_tpu.')
        if m.name not in SKIP and not m.name.endswith('__main__'))
    entries = {}
    for modname in mods:
        short, fname, summary = emit_module(modname)
        entries[short] = (fname, summary)

    index = ['# torchdrivesim_tpu API reference\n',
             'Generated by `tools/gen_api_docs.py` — regenerate after '
             'changing public signatures or docstrings:\n',
             '```\nTDS_PLATFORM=cpu python tools/gen_api_docs.py\n```\n']
    seen = set()
    for section, names in SECTION_ORDER:
        rows = [n for n in names if n in entries]
        if not rows:
            continue
        index.append(f'## {section}\n')
        for n in rows:
            fname, summary = entries[n]
            index.append(f'- [`{n}`]({fname}) — {summary}')
            seen.add(n)
        index.append('')
    rest = [n for n in sorted(entries) if n not in seen
            and n != 'torchdrivesim_tpu']
    if rest:
        index.append('## Other modules\n')
        for n in rest:
            fname, summary = entries[n]
            index.append(f'- [`{n}`]({fname}) — {summary}')
        index.append('')
    (OUT / 'index.md').write_text('\n'.join(index) + '\n')
    print(f'wrote {len(entries)} module pages to {OUT}')


if __name__ == '__main__':
    main()
