"""get_json_schema parity vs the reference implementation (installed torch
transformers is the oracle)."""

import sys
from pathlib import Path
from typing import List, Optional, Union

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from transformers_tpu.utils.chat_template_utils import (  # noqa: E402
    DocstringParsingException,
    TypeHintParsingException,
    get_json_schema,
)


def weather(location: str, unit: str = "celsius", days: int = 3):
    """Get the weather forecast.

    Args:
        location: The city to fetch weather for.
        unit: Temperature unit (choices: ["celsius", "fahrenheit"])
        days: Number of forecast days.
    """


def compute(values: List[float], weights: Optional[List[float]] = None,
            mode: Union[int, str] = 0) -> float:
    """Weighted aggregate of values.

    Args:
        values: The numbers to aggregate.
        weights: Optional weights, same length as values.
        mode: Aggregation mode id or name.

    Returns:
        The aggregated value.
    """
    return 0.0


@pytest.mark.parametrize("fn", [weather, compute])
def test_schema_matches_reference(fn):
    from transformers.utils import get_json_schema as ref_schema

    assert get_json_schema(fn) == ref_schema(fn)


def test_missing_docstring_raises():
    def nodoc(x: int):
        pass

    with pytest.raises(DocstringParsingException):
        get_json_schema(nodoc)


def test_missing_hint_raises():
    def nohint(x):
        """Something.

        Args:
            x: A thing.
        """

    with pytest.raises(TypeHintParsingException):
        get_json_schema(nohint)


def test_tools_rendered_in_chat_template():
    """Callables passed as tools= are auto-converted before rendering."""
    from transformers_tpu.tokenization.base import PreTrainedTokenizer

    class T(PreTrainedTokenizer):
        bos_token = eos_token = pad_token = ""
        name_or_path = "t"
        chat_template = (
            "{% for tool in tools %}{{ tool.function.name }}:{{ tool.function.parameters.required|join(',') }};"
            "{% endfor %}{% for m in messages %}{{ m.content }}{% endfor %}")

        def __init__(self):
            pass

    out = T().apply_chat_template(
        [{"role": "user", "content": "hi"}], tools=[weather], tokenize=False)
    assert out == "weather:location;hi"
