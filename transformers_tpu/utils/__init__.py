from . import logging
from .generic import GeneralInterface, ModelOutput, flatten_dict, unflatten_dict
from .hub import cached_file, cached_files, has_file

from .chat_template_utils import (  # noqa: F401
    DocstringParsingException,
    TypeHintParsingException,
    get_json_schema,
)
