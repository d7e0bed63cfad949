"""Curated prompt libraries (S7): shipped assets + PromptDeserializer-keyed
loader, round-tripped through LLMExtractor with fake backends."""

import pytest

LINES = ["The GUI talks to the DB.", "Users love it!"]

STRUCTURED_ANSWER = (
    "COMPONENT entities recognized:\n"
    "GUI, 'The GUI talks to the DB.'\n"
    "Alternative names:\n"
    "GUI: None\n"
)

JSON_ANSWER = (
    '[{"name": "GUI", "type": "COMPONENT", "alternativeNames": [],'
    ' "occurrences": ["The GUI talks to the DB."]}]'
)


def test_libraries_ship_all_variants():
    from naer_ray.prompts import VARIANTS, load_library, load_two_part_library

    for kind in ("json", "structured-text"):
        lib = load_library(kind)
        assert set(lib) == set(VARIANTS)
        for text in lib.values():
            assert len(text) > 50
    # shot variants build on the zero-shot instruction set
    jl = load_library("json")
    assert jl["one-shot"].startswith(jl["zero-shot"].split("\n")[0])
    assert "Example" in jl["one-shot"]
    firsts, seconds = load_two_part_library()
    assert len(firsts) == 5 and len(seconds) == 1
    assert all(f for f in firsts)


def test_asset_text_matches_reference_resources():
    """The shipped assets ARE the reference's resource files (byte-equal) —
    reference: src/main/resources/*-prompts.txt."""
    import os

    from naer_ray.prompts import _ASSET_DIR

    ref = "/root/reference/src/main/resources"
    if not os.path.isdir(ref):
        pytest.skip("reference tree not present")
    for name in (
        "json-output-prompts.txt",
        "structured-text-output-prompts.txt",
        "2-part-prompts.txt",
        "component_recognition_example_prompt.txt",
    ):
        with open(os.path.join(_ASSET_DIR, name), "rb") as a, open(
            os.path.join(ref, name), "rb"
        ) as b:
            assert a.read() == b.read(), name


def test_make_prompt_keying_matches_deserializer():
    """Type keys and validation mirror PromptDeserializer.java:40-50."""
    from naer_ray.prompts import make_prompt
    from naer_ray.stages.llm import JSON_FORMAT, STRUCTURED_TEXT_FORMAT, TwoPartPrompt

    p = make_prompt("JSON_OUTPUT_PROMPT", "find stuff")
    assert p.answer_format == JSON_FORMAT and p.text == "find stuff"
    p = make_prompt("STRUCTURED_TEXT_OUTPUT_PROMPT", "find stuff")
    assert p.answer_format == STRUCTURED_TEXT_FORMAT
    tp = make_prompt("TWO_PART_PROMPT", "first", "second")
    assert isinstance(tp, TwoPartPrompt)
    with pytest.raises(ValueError):
        make_prompt("TWO_PART_PROMPT", "first", "   ")
    with pytest.raises(ValueError):
        make_prompt("BANANA_PROMPT", "x")


@pytest.mark.parametrize("variant", ["zero-shot", "one-shot", "two-shot", "cot"])
def test_json_library_roundtrip_through_extractor(variant):
    from naer_ray.prompts import load_library, make_prompt
    from naer_ray.stages.llm import LLMExtractor

    prompts_seen = []

    def chat(system, prompt):
        prompts_seen.append(prompt)
        return JSON_ANSWER

    ex = LLMExtractor(chat, make_prompt("JSON_OUTPUT_PROMPT", variant=variant))
    entities = ex.recognize(LINES)
    assert [e.name for e in entities] == ["GUI"]
    # the rendered prompt embeds the shipped library text verbatim
    assert prompts_seen[0].startswith(load_library("json")[variant])


@pytest.mark.parametrize("variant", ["zero-shot", "one-shot", "two-shot", "cot"])
def test_structured_library_roundtrip_through_extractor(variant):
    from naer_ray.prompts import load_library, make_prompt
    from naer_ray.stages.llm import LLMExtractor

    prompts_seen = []

    def chat(system, prompt):
        prompts_seen.append(prompt)
        return STRUCTURED_ANSWER

    ex = LLMExtractor(
        chat, make_prompt("STRUCTURED_TEXT_OUTPUT_PROMPT", variant=variant)
    )
    entities = ex.recognize(LINES)
    assert [e.name for e in entities] == ["GUI"]
    assert prompts_seen[0].startswith(load_library("structured-text")[variant])


def test_two_part_library_roundtrip_through_extractor():
    from naer_ray.prompts import load_two_part_library, make_prompt
    from naer_ray.stages.llm import LLMExtractor

    firsts, seconds = load_two_part_library()
    prompts_seen = []

    def chat(system, prompt):
        prompts_seen.append(prompt)
        # call 1 = recognition (first text); call 2 = JSON-ify
        return "free-form notes" if len(prompts_seen) == 1 else JSON_ANSWER

    for i in range(len(firsts)):
        prompts_seen.clear()
        tp = make_prompt("TWO_PART_PROMPT", firsts[i], seconds[0])
        ex = LLMExtractor(chat, tp)
        entities = ex.recognize(LINES)
        assert [e.name for e in entities] == ["GUI"]
        assert prompts_seen[0].startswith(firsts[i])
        assert prompts_seen[1].startswith(seconds[0] + "\nLast answer:\n")


def test_example_prompt_asset_loads():
    from naer_ray.prompts import load_example_prompt

    assert len(load_example_prompt()) > 100
