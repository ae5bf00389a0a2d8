"""Explicit input schemas for the four reference domains (FIXTURES.md
family B; derived from the reference's inferred-read + DDL contracts).

The reference infers every schema at read time (extra full pass over the
JSON, and silent drift when fields vanish — SURVEY.md §1.3). Pinning
them here makes reads single-pass and deterministic.
"""

from pyspark.sql import types as T


def _s(*fields) -> T.StructType:
    return T.StructType(list(fields))


def _f(name, dtype) -> T.StructField:
    return T.StructField(name, dtype, True)


S = T.StringType()
L = T.LongType()
B = T.BooleanType()

# --- Zoom (zoom_proc.py:130-208; fixtures B1/B2) ---------------------------

ZOOM_RECORDING_FILE = _s(
    _f("download_url", S), _f("file_extension", S), _f("file_size", L),
    _f("file_type", S), _f("id", S), _f("meeting_id", S), _f("play_url", S),
    _f("recording_start", S), _f("recording_end", S), _f("recording_type", S),
    _f("status", S),
)

ZOOM_MEETINGS = _s(
    _f("from", S), _f("to", S), _f("page_size", L), _f("total_records", L),
    _f(
        "meetings",
        T.ArrayType(
            _s(
                _f("account_id", S), _f("duration", L), _f("host_email", S),
                _f("host_id", S), _f("id", L), _f("recording_count", L),
                _f("share_url", S), _f("start_time", S), _f("timezone", S),
                _f("topic", S), _f("total_size", L), _f("type", L),
                _f("uuid", S),
                _f("recording_files", T.ArrayType(ZOOM_RECORDING_FILE)),
            )
        ),
    ),
)

ZOOM_PARTICIPANT = _s(
    _f("camera", S), _f("connection_type", S), _f("customer_key", S),
    _f("data_center", S), _f("device", S), _f("domain", S), _f("email", S),
    _f("from_sip_uri", S), _f("full_data_center", S), _f("harddisk_id", S),
    _f("id", S), _f("internal_ip_addresses", T.ArrayType(S)),
    _f("ip_address", S), _f("join_time", S), _f("leave_time", S),
    _f("leave_reason", S), _f("location", S), _f("mac_addr", S),
    _f("microphone", S), _f("network_type", S), _f("participant_user_id", S),
    _f("pc_name", S), _f("recording", B), _f("registrant_id", S),
    _f("role", S), _f("share_application", B), _f("share_desktop", B),
    _f("share_whiteboard", B), _f("sip_uri", S), _f("speaker", S),
    _f("status", S), _f("user_id", S), _f("user_name", S), _f("version", S),
)

ZOOM_PARTICIPANTS = _s(
    _f("uuid", S),
    _f(
        "participants_data",
        _s(
            _f("page_count", L), _f("page_size", L), _f("total_records", L),
            _f("participants", T.ArrayType(ZOOM_PARTICIPANT)),
        ),
    ),
)

# --- SurveyMonkey (monkey_proc.py:122-161; fixtures B3/B4) ------------------

MONKEY_CHOICE = _s(
    _f("id", L), _f("is_na", B), _f("position", L),
    _f("quiz_options", _s(_f("score", S))),
    _f("text", S), _f("visible", B), _f("weight", L),
)

MONKEY_SURVEY = _s(
    _f("id", S), _f("title", S), _f("language", S), _f("folder_id", L),
    _f("page_count", L), _f("question_count", L), _f("response_count", L),
    _f("href", S), _f("date_created", S), _f("date_modified", S),
    _f(
        "pages",
        T.ArrayType(
            _s(
                _f("id", L), _f("position", L), _f("question_count", L),
                _f("title", S),
                _f(
                    "questions",
                    T.ArrayType(
                        _s(
                            _f("id", L), _f("position", L),
                            _f(
                                "headings",
                                T.ArrayType(
                                    _s(
                                        _f("heading", S),
                                        _f("choices", T.ArrayType(MONKEY_CHOICE)),
                                    )
                                ),
                            ),
                            _f("answers", _s(_f("other_id", L))),
                        )
                    ),
                ),
            )
        ),
    ),
)

MONKEY_RESPONSES = _s(
    _f("per_page", L), _f("total", L), _f("links", _s(_f("self", S))),
    _f(
        "data",
        T.ArrayType(
            _s(
                _f("id", L), _f("survey_id", L), _f("recipient_id", L),
                _f("date_created", S), _f("date_modified", S),
                _f("email_address", S), _f("ip_address", S),
                _f("first_name", S), _f("last_name", S),
                _f("response_status", S), _f("total_time", L),
                _f(
                    "pages",
                    T.ArrayType(
                        _s(
                            _f("id", L),
                            _f(
                                "questions",
                                T.ArrayType(
                                    _s(
                                        _f("id", L),
                                        _f(
                                            "answers",
                                            T.ArrayType(
                                                _s(
                                                    _f("choice_id", L),
                                                    _f("row_id", L),
                                                    _f("text", S),
                                                    _f("choices", _s(_f("weight", L))),
                                                )
                                            ),
                                        ),
                                    )
                                ),
                            ),
                        )
                    ),
                ),
            )
        ),
    ),
)

# --- VK (vk_proc.py:122-261; fixtures B5/B6/B7) -----------------------------

VK_GROUP = _s(
    _f("id", L), _f("type", S), _f("name", S), _f("screen_name", S),
    _f("activity", S), _f("description", S), _f("is_closed", L),
    _f("members_count", L), _f("status", S), _f("verified", L),
    _f("site", S), _f("wiki_page", S),
    _f("city", _s(_f("id", L), _f("title", S))),
    _f("country", _s(_f("id", L), _f("title", S))),
    _f("contacts", T.ArrayType(_s(_f("desc", S), _f("email", S), _f("phone", S)))),
    _f(
        "links",
        T.ArrayType(_s(_f("id", L), _f("name", S), _f("desc", S), _f("url", S))),
    ),
)

VK_MEMBER = _s(
    _f("id", L), _f("first_name", S), _f("last_name", S), _f("maiden_name", S),
    _f("screen_name", S), _f("nickname", S), _f("sex", L),
    _f("city", _s(_f("id", L), _f("title", S))),
    _f("country", _s(_f("id", L), _f("title", S))),
    _f("home_town", S), _f("about", S), _f("activities", S), _f("books", S),
    _f("can_post", L), _f("deactivated", S), _f("domain", S),
    _f("followers_count", L), _f("friend_status", L), _f("games", S),
    _f("interests", S), _f("is_closed", B), _f("is_friend", L),
    _f("personal", S), _f("site", S), _f("skype", S), _f("livejournal", S),
    _f("twitter", S), _f("has_mobile", L), _f("mobile_phone", S),
    _f("home_phone", S), _f("status", S), _f("relation", L),
    _f(
        "relation_partner",
        _s(_f("id", L), _f("first_name", S), _f("last_name", S)),
    ),
    _f("education", _s(_f("form", S), _f("status", S))),
    _f("faculty", L), _f("faculty_name", S), _f("graduation", L),
    _f("university", L), _f("university_name", S),
    _f("occupation", _s(_f("id", L), _f("name", S), _f("type", S))),
    _f("movies", S), _f("music", S), _f("trending", L), _f("tv", S),
    _f("verified", L), _f("wall_default", S),
    _f("last_seen", _s(_f("platform", L), _f("time", L))),
    _f(
        "career",
        T.ArrayType(
            _s(
                _f("city_id", L), _f("country_id", L), _f("company", S),
                _f("group_id", L), _f("position", S), _f("from", L), _f("until", L),
            )
        ),
    ),
    _f(
        "schools",
        T.ArrayType(
            _s(
                _f("city", L), _f("class", S), _f("country", L), _f("id", S),
                _f("name", S), _f("speciality", S), _f("type", L),
                _f("type_str", S), _f("year_from", L), _f("year_graduated", L),
                _f("year_to", L),
            )
        ),
    ),
    _f(
        "universities",
        T.ArrayType(
            _s(
                _f("chair", L), _f("chair_name", S), _f("city", L),
                _f("country", L), _f("education_form", S),
                _f("education_status", S), _f("faculty", L),
                _f("faculty_name", S), _f("graduation", L), _f("id", L),
                _f("name", S),
            )
        ),
    ),
)

VK_WALL = _s(
    _f("count", L),
    _f(
        "items",
        T.ArrayType(
            _s(
                _f("owner_id", L), _f("from_id", L), _f("id", L),
                _f("date", L), _f("edited", L), _f("post_type", S), _f("text", S),
                _f("comments", _s(_f("count", L))),
                _f("donut", _s(_f("is_donut", B))),
                _f("likes", _s(_f("count", L), _f("user_likes", L))),
                _f("post_source", _s(_f("type", S), _f("platform", S))),
                _f("reposts", _s(_f("count", L), _f("user_reposted", L))),
                _f("views", _s(_f("count", L))),
                _f(
                    "copy_history",
                    T.ArrayType(
                        _s(
                            _f("id", L), _f("from_id", L), _f("owner_id", L),
                            _f("date", L), _f("post_type", S), _f("text", S),
                            _f("post_source", _s(_f("platform", S), _f("type", S))),
                        )
                    ),
                ),
            )
        ),
    ),
)

# --- JupyterHub fluent-bit logs (jhub_proc.py:123-173; fixture B8) ----------

JHUB_LOG = _s(
    _f("time", S),
    _f("log", S),
    _f(
        "kubernetes",
        _s(
            _f("container_name", S), _f("host", S), _f("pod_name", S),
            _f("annotations", T.MapType(S, S)), _f("labels", T.MapType(S, S)),
        ),
    ),
)
