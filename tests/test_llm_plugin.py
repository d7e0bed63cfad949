"""LLM-extractor plugin parity (ST1-ST4) with deterministic fake backends."""

import pytest

from naer_ray.stages.llm import (
    JSON_FORMAT,
    REPAIR_PREFIX,
    SYSTEM_MESSAGE,
    LLMExtractor,
    Prompt,
)

LINES = ["The GUI talks to the DB.", "Users love it!"]

GOOD_ANSWER = (
    "COMPONENT entities recognized:\n"
    "GUI, 'The GUI talks to the DB.'\n"
    "Alternative names:\n"
    "GUI: None\n"
)


def test_prompt_assembly_and_one_shot_gazetteer():
    p = Prompt("Find entities.")
    p.add_possible_entities({"COMPONENT": ["GUI", "DB"]})
    assert "component entities: GUI, DB" in p.text
    with pytest.raises(RuntimeError):
        p.add_possible_entities({"COMPONENT": ["X"]})
    # empty map is a no-op and doesn't trip the one-shot flag
    p2 = Prompt("x")
    p2.add_possible_entities({})
    p2.add_possible_entities({"COMPONENT": ["A"]})
    assert "component entities: A" in p2.text
    rendered = p.render(LINES)
    assert rendered.endswith("\nText:\n" + "\n".join(LINES))


def test_happy_path():
    calls = []

    def chat(system, prompt):
        calls.append((system, prompt))
        return GOOD_ANSWER

    ex = LLMExtractor(chat, Prompt("Find entities."))
    entities = ex.recognize(LINES)
    assert [e.name for e in entities] == ["GUI"]
    assert entities[0].sorted_occurrences() == [(1, "DIRECT")]
    assert calls[0][0] == SYSTEM_MESSAGE


def test_repair_loop_recovers():
    answers = iter(["THIS IS GARBAGE WITH NO SECTIONS", GOOD_ANSWER])
    prompts = []

    def chat(system, prompt):
        prompts.append(prompt)
        return next(answers)

    ex = LLMExtractor(chat, Prompt("Find entities."))
    entities = ex.recognize(LINES)
    assert [e.name for e in entities] == ["GUI"]
    assert len(prompts) == 2
    assert prompts[1].startswith(REPAIR_PREFIX)
    assert "THIS IS GARBAGE" in prompts[1]  # invalid output included


def test_second_failure_dead_letters():
    def chat(system, prompt):
        return "STILL GARBAGE"

    ex = LLMExtractor(chat, Prompt("Find entities."))
    out = ex.extract("conv-1", LINES)
    assert out.num_rows == 1
    assert out.column("pred").to_pylist() == ["__error__"]


def test_json_format_backend():
    answer = (
        'noise [{"name": "GUI", "type": "COMPONENT", "alternativeNames": [],'
        ' "occurrences": ["The GUI talks to the DB."]}] trailing'
    )
    ex = LLMExtractor(lambda s, p: answer, Prompt("Find.", JSON_FORMAT))
    entities = ex.recognize(LINES)
    assert entities[0].name == "GUI"
    assert entities[0].sorted_occurrences() == [(1, "DIRECT")]
