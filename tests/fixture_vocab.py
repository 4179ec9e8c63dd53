"""Fixture vocabulary reproducing the reference tokenizer goldens offline.

The reference's golden tests (examples/test_tokenizer.cpp:70-73) need the
real bert-base-uncased vocab.txt, which is not available in this sandbox
(zero egress). This module reconstructs a 30522-entry fixture vocab that
places every token string needed by the goldens at its real
bert-base-uncased id (the word→id alignment was derived from the golden
sequences themselves; the punctuation/digit block 999-1065 matches the real
vocab layout exactly). All other slots are filled with "[unused{i}]"
placeholders, which can never collide with the ASCII words/punctuation the
tokenizer produces.

The four golden (input, expected-ids) cases are carried over verbatim from
examples/test_tokenizer.cpp:70-73.
"""

from bert_tpu.vocab import Vocab

VOCAB_SIZE = 30522

# word/punct/digit → real bert-base-uncased id (derived from the goldens)
KNOWN_TOKENS = {
    "[PAD]": 0,
    "[UNK]": 100,
    "[CLS]": 101,
    "[SEP]": 102,
    "[MASK]": 103,
    # punctuation block (matches real vocab ids 999-1065)
    "!": 999, '"': 1000, "#": 1001, "$": 1002, "%": 1003, "&": 1004,
    "'": 1005, "(": 1006, ")": 1007, "*": 1008, "+": 1009, ",": 1010,
    "-": 1011, ".": 1012, "/": 1013,
    "0": 1014, "1": 1015, "2": 1016, "3": 1017, "4": 1018, "5": 1019,
    "6": 1020, "7": 1021, "8": 1022, "9": 1023,
    ":": 1024, ";": 1025, "<": 1026, "=": 1027, ">": 1028, "?": 1029,
    "@": 1030, "[": 1031, "\\": 1032, "]": 1033, "^": 1034, "_": 1035,
    "`": 1036, "{": 1063, "|": 1064, "}": 1065, "~": 1066,
    # single letters
    "a": 1037, "b": 1038, "c": 1039, "d": 1040, "e": 1041, "f": 1042,
    "g": 1043, "h": 1044, "i": 1045, "j": 1046, "k": 1047, "l": 1048,
    "m": 1049, "n": 1050, "o": 1051, "p": 1052, "q": 1053, "r": 1054,
    "s": 1055, "t": 1056, "u": 1057, "v": 1058, "w": 1059, "x": 1060,
    "y": 1061, "z": 1062,
    # golden case 1: "Québec"
    "quebec": 5447,
    # golden case 2 (Finnish): chosen splits, see tests
    "sy": 25353, "##om": 5358, "##me": 4168,
    "ta": 11937, "##alla": 25425,
    "tan": 9092, "##aan": 14634,
    # golden case 3 (English)
    "going": 2183, "to": 2000, "the": 1996, "store": 3573, "buy": 4965,
    "apples": 18108, "and": 1998, "banana": 15212, "you": 2017, "re": 2128,
    "welcome": 6160, "come": 2272, "along": 2247, "if": 2065, "like": 2066,
    "time": 2051, "is": 2003, "30": 2382, "it": 2009, "partly": 6576,
    "cloudy": 24706, "outside": 2648, "ll": 2222, "be": 2022, "back": 2067,
    "soon": 2574, "so": 2061, "don": 2123, "go": 2175, "anywhere": 5973,
    # golden case 4 (C code)
    "int": 20014, "stack": 9991, "1000": 6694, "top": 2327,
    "calculate": 18422, "char": 25869, "operator": 6872, "return": 2709,
    "void": 11675, "push": 5245, "pop": 3769,
    "evaluate": 16157, "##post": 19894, "##fi": 8873, "##x": 2595,
    "expression": 3670, "for": 2005,
    "##di": 4305, "##git": 23806,
    "else": 2842, "result": 2765, "input": 7953,
}


def build_fixture_tokens():
    tokens = [f"[unused{i}]" for i in range(VOCAB_SIZE)]
    for tok, i in KNOWN_TOKENS.items():
        tokens[i] = tok
    return tokens


def build_fixture_vocab() -> Vocab:
    return Vocab.from_tokens(build_fixture_tokens())


# (input, expected token ids) — verbatim from examples/test_tokenizer.cpp:70-73
GOLDEN_CASES = [
    ("Québec", [101, 5447, 102]),
    (
        "syömme \t  täällä    tänään",
        [101, 25353, 5358, 4168, 11937, 25425, 9092, 14634, 102],
    ),
    (
        "I'm going to the store to buy 3 apples and a banana! You're welcome "
        "to come along if you'd like. The time is 2:30 p.m. and it's partly "
        "cloudy outside. I'll be back soon, so don't go anywhere.",
        [101, 1045, 1005, 1049, 2183, 2000, 1996, 3573, 2000, 4965, 1017,
         18108, 1998, 1037, 15212, 999, 2017, 1005, 2128, 6160, 2000, 2272,
         2247, 2065, 2017, 1005, 1040, 2066, 1012, 1996, 2051, 2003, 1016,
         1024, 2382, 1052, 1012, 1049, 1012, 1998, 2009, 1005, 1055, 6576,
         24706, 2648, 1012, 1045, 1005, 2222, 2022, 2067, 2574, 1010, 2061,
         2123, 1005, 1056, 2175, 5973, 1012, 102],
    ),
    (
        "\"5 2 + 3 * 4 -\"; int stack[1000], top = -1; int calculate(int a, "
        "int b, char operator) { return operator == '+' ? a + b : operator "
        "== '-' ? a - b : operator == '*' ? a * b : a / b; } void push(int "
        "x) { stack[++top] = x; } int pop() { return stack[top--]; } int "
        "evaluatePostfix(char* expression) { for (int i = 0; expression[i]; "
        "i++) { if (isdigit(expression[i])) push(expression[i] - '0'); else "
        "{ int a = pop(), b = pop(); push(calculate(b, a, expression[i])); "
        "} } return pop(); } int result = evaluatePostfix(input);",
        [101, 1000, 1019, 1016, 1009, 1017, 1008, 1018, 1011, 1000, 1025,
         20014, 9991, 1031, 6694, 1033, 1010, 2327, 1027, 1011, 1015, 1025,
         20014, 18422, 1006, 20014, 1037, 1010, 20014, 1038, 1010, 25869,
         6872, 1007, 1063, 2709, 6872, 1027, 1027, 1005, 1009, 1005, 1029,
         1037, 1009, 1038, 1024, 6872, 1027, 1027, 1005, 1011, 1005, 1029,
         1037, 1011, 1038, 1024, 6872, 1027, 1027, 1005, 1008, 1005, 1029,
         1037, 1008, 1038, 1024, 1037, 1013, 1038, 1025, 1065, 11675, 5245,
         1006, 20014, 1060, 1007, 1063, 9991, 1031, 1009, 1009, 2327, 1033,
         1027, 1060, 1025, 1065, 20014, 3769, 1006, 1007, 1063, 2709, 9991,
         1031, 2327, 1011, 1011, 1033, 1025, 1065, 20014, 16157, 19894,
         8873, 2595, 1006, 25869, 1008, 3670, 1007, 1063, 2005, 1006, 20014,
         1045, 1027, 1014, 1025, 3670, 1031, 1045, 1033, 1025, 1045, 1009,
         1009, 1007, 1063, 2065, 1006, 2003, 4305, 23806, 1006, 3670, 1031,
         1045, 1033, 1007, 1007, 5245, 1006, 3670, 1031, 1045, 1033, 1011,
         1005, 1014, 1005, 1007, 1025, 2842, 1063, 20014, 1037, 1027, 3769,
         1006, 1007, 1010, 1038, 1027, 3769, 1006, 1007, 1025, 5245, 1006,
         18422, 1006, 1038, 1010, 1037, 1010, 3670, 1031, 1045, 1033, 1007,
         1007, 1025, 1065, 1065, 2709, 3769, 1006, 1007, 1025, 1065, 20014,
         2765, 1027, 16157, 19894, 8873, 2595, 1006, 7953, 1007, 1025, 102],
    ),
]
