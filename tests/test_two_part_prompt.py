"""ST3 TwoPartPrompt: two-call chain parity (TwoPartPrompt.java:56-147)."""

import json

import pytest

from naer_ray.stages.llm import (
    SYSTEM_MESSAGE,
    TWO_PART_EXPECTED_FORMAT,
    LLMExtractor,
    TwoPartPrompt,
)

LINES = ["The AuthService handles login.", "It forwards credentials to the DB."]

JSON_ANSWER = json.dumps(
    [
        {
            "name": "AuthService",
            "type": "COMPONENT",
            "alternativeNames": [],
            "occurrences": ["The AuthService handles login."],
        }
    ]
)


def test_blank_second_text_rejected():
    with pytest.raises(ValueError, match="Second part"):
        TwoPartPrompt("first", "   ")


def test_two_calls_chain():
    calls = []

    def chat(system, prompt):
        calls.append((system, prompt))
        return "free-form notes" if len(calls) == 1 else JSON_ANSWER

    ex = LLMExtractor(chat, TwoPartPrompt("Find components.", "Make JSON."))
    entities = ex.recognize(LINES)
    assert [e.name for e in entities] == ["AuthService"]
    assert len(calls) == 2
    # call 1: first text + Text block
    assert calls[0][0] == SYSTEM_MESSAGE
    assert calls[0][1].startswith("Find components.")
    assert "\nText:\n" + "\n".join(LINES) in calls[0][1]
    # call 2: second text + the verbatim part-1 answer
    assert calls[1][1].startswith("Make JSON.")
    assert "\nLast answer:\nfree-form notes" in calls[1][1]


def test_repair_uses_json_template():
    answers = iter(["notes", "NOT JSON", "still notes", JSON_ANSWER])
    prompts = []

    def chat(system, prompt):
        prompts.append(prompt)
        return next(answers)

    ex = LLMExtractor(chat, TwoPartPrompt("Find.", "JSONify."))
    with pytest.raises(Exception):
        # repair path: after the 2-call chain fails to parse, ONE repair
        # chat happens (a plain call, not a re-run of the chain)
        ex.recognize(LINES)
    # chain (2 calls) + repair (1 call) = 3
    assert len(prompts) == 3
    assert TWO_PART_EXPECTED_FORMAT in prompts[2]
    assert "Invalid output:\nNOT JSON" in prompts[2]


def test_default_prompt_pair():
    p = TwoPartPrompt.default()
    assert "architecturally relevant" in p.text
    assert "Last answer" not in p.text
    assert "JSON array" in p.second_text
    assert p.expected_output_format() == TWO_PART_EXPECTED_FORMAT


def test_recognizer_builder_parity():
    from naer_ray.stages.llm import Prompt, RecognizerBuilder

    with pytest.raises(ValueError, match="chat model"):
        RecognizerBuilder().chat_model(None)
    with pytest.raises(ValueError, match="prompt"):
        RecognizerBuilder().prompt(None)
    with pytest.raises(ValueError, match="chat model"):
        RecognizerBuilder().build()  # chat model is required

    def chat(system, prompt):
        return "free" if "Text:" in prompt else JSON_ANSWER

    # default prompt = TwoPartPrompt.default() (reference Builder default)
    ex = RecognizerBuilder().chat_model(chat).build()
    assert isinstance(ex.prompt, TwoPartPrompt)

    # possible-entities injection (recognize(sad, possibleEntities) parity)
    p = Prompt("Find.")
    ex2 = RecognizerBuilder().chat_model(chat).prompt(p).build(
        possible_entities={"COMPONENT": ["AuthService"]}
    )
    assert "component entities: AuthService" in ex2.prompt.text


def test_repair_recovers_with_two_part():
    answers = iter(["notes", "garbage", JSON_ANSWER])

    def chat(system, prompt):
        return next(answers)

    ex = LLMExtractor(chat, TwoPartPrompt("Find.", "JSONify."))
    entities = ex.recognize(LINES)
    assert [e.name for e in entities] == ["AuthService"]
