"""Dataclass -> argparse CLI parser.

TPU-native analog of reference src/transformers/hf_argparser.py:111
(``HfArgumentParser``): turn dataclasses (e.g. TrainingArguments) into a
command line, with json/yaml file loading.
"""

from __future__ import annotations

import dataclasses
import json
import sys
from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser
from enum import Enum
from pathlib import Path
from typing import Any, Optional, Union, get_args, get_origin


def _string_to_bool(v):
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise ValueError(f"Not a boolean: {v!r}")


class HfArgumentParser(ArgumentParser):
    def __init__(self, dataclass_types, **kwargs):
        kwargs.setdefault("formatter_class", ArgumentDefaultsHelpFormatter)
        super().__init__(**kwargs)
        if dataclasses.is_dataclass(dataclass_types):
            dataclass_types = [dataclass_types]
        self.dataclass_types = list(dataclass_types)
        for dtype in self.dataclass_types:
            self._add_dataclass_arguments(dtype)

    def _add_dataclass_arguments(self, dtype):
        for field in dataclasses.fields(dtype):
            if not field.init:
                continue
            name = f"--{field.name}"
            kwargs: dict[str, Any] = {}
            ftype = field.type
            if isinstance(ftype, str):
                ftype = eval(ftype, vars(sys.modules[dtype.__module__]))  # noqa: S307
            origin = get_origin(ftype)
            if origin is Union:
                args = [a for a in get_args(ftype) if a is not type(None)]
                ftype = args[0] if args else str
                origin = get_origin(ftype)
            if isinstance(ftype, type) and issubclass(ftype, Enum):
                kwargs["choices"] = [e.value for e in ftype]
                kwargs["type"] = type(list(ftype)[0].value)
            elif ftype is bool:
                kwargs["type"] = _string_to_bool
                kwargs["nargs"] = "?"
                kwargs["const"] = True
            elif origin in (list, tuple) or ftype in (list, tuple):
                inner = get_args(ftype)[0] if get_args(ftype) else str
                kwargs["type"] = inner if isinstance(inner, type) else str
                kwargs["nargs"] = "+"
            elif ftype in (int, float, str):
                kwargs["type"] = ftype
            else:
                kwargs["type"] = str
            if field.default is not dataclasses.MISSING:
                kwargs["default"] = field.default
            elif field.default_factory is not dataclasses.MISSING:
                kwargs["default"] = field.default_factory()
            else:
                kwargs["required"] = True
            self.add_argument(name, **kwargs)

    def parse_args_into_dataclasses(self, args=None, return_remaining_strings=False):
        namespace, remaining = self.parse_known_args(args=args)
        outputs = []
        for dtype in self.dataclass_types:
            keys = {f.name for f in dataclasses.fields(dtype) if f.init}
            inputs = {k: v for k, v in vars(namespace).items() if k in keys}
            for k in keys:
                vars(namespace).pop(k, None)
            outputs.append(dtype(**inputs))
        if return_remaining_strings:
            return (*outputs, remaining)
        if remaining:
            raise ValueError(f"Unrecognized arguments: {remaining}")
        return tuple(outputs)

    def parse_json_file(self, json_file, allow_extra_keys=False):
        with open(json_file, encoding="utf-8") as f:
            data = json.load(f)
        return self.parse_dict(data, allow_extra_keys=allow_extra_keys)

    def parse_dict(self, args: dict, allow_extra_keys=False):
        unused = set(args.keys())
        outputs = []
        for dtype in self.dataclass_types:
            keys = {f.name for f in dataclasses.fields(dtype) if f.init}
            inputs = {k: v for k, v in args.items() if k in keys}
            unused -= inputs.keys()
            outputs.append(dtype(**inputs))
        if unused and not allow_extra_keys:
            raise ValueError(f"Keys not used by any dataclass: {sorted(unused)}")
        return tuple(outputs)
