"""Pure-python localization kernels (the parity surface vs giggls/osml10n).

Every kernel here is a deterministic pure function designed to run
inside Arrow-batched pandas UDFs; Spark wrappers live in
osml10n_spark.udfs.
"""
from .abbrev import (street_abbrev, street_abbrev_all, street_abbrev_latin,
                     street_abbrev_non_latin)
from .levenshtein import levenshtein_bytes
from .names import (format_combined_name, gen_combined_names, get_country_name,
                    get_localized_name_from_tags, get_names_from_tags,
                    get_placename_from_tags, get_streetname_from_tags)
from .scripts import contains_cjk, contains_cyrillic, contains_thai, is_latin
from .translit import (cantonese_transcript, generic_transliterate,
                       kanji_transcript, thai_transcript, transcript)
from .unaccent import unaccent
