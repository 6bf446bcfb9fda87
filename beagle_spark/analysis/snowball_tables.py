"""Exact Snowball among tables for the tier-3 languages, transcribed
from the published Snowball programs (snowballstem.org) and verified
byte-exact against the Snowball 2.x tables compiled into PostgreSQL
15's dict_snowball.so (extracted with tools/extract_among.py; the same
generated sources Lucene 8.x uses for the reference,
/root/reference/deps.edn lucene 8.9.0).

Each entry is (suffix, result); result selects the action branch in
the language's stem program (see snowball_misc.py /
snowball_romance.py).
"""

from .snowball_rt import compile_among

# --------------------------------------------------------------------
# Basque (basque.sbl): adjetiboak / izenak / aditzak
# --------------------------------------------------------------------
EU_ADJ = compile_among([
    ('zlea', 2), ('keria', 1), ('la', 1), ('era', 1), ('dade', 1),
    ('tade', 1), ('date', 1), ('tate', 1), ('gi', 1), ('ki', 1), ('ik', 1),
    ('lanik', 1), ('rik', 1), ('larik', 1), ('ztik', 1), ('go', 1),
    ('ro', 1), ('ero', 1), ('to', 1),
])

EU_NOUN = compile_among([
    ('ada', 1), ('kada', 1), ('anda', 1), ('denda', 1), ('gabea', 1),
    ('kabea', 1), ('aldea', 1), ('kaldea', 1), ('taldea', 1), ('ordea', 1),
    ('zalea', 1), ('tzalea', 1), ('gilea', 1), ('emea', 1), ('kumea', 1),
    ('nea', 1), ('enea', 1), ('zionea', 1), ('unea', 1), ('gunea', 1),
    ('pea', 1), ('aurrea', 1), ('tea', 1), ('kotea', 1), ('artea', 1),
    ('ostea', 1), ('etxea', 1), ('ga', 1), ('anga', 1), ('gaia', 1),
    ('aldia', 1), ('taldia', 1), ('handia', 1), ('mendia', 1), ('geia', 1),
    ('egia', 1), ('degia', 1), ('tegia', 1), ('nahia', 1), ('ohia', 1),
    ('kia', 1), ('tokia', 1), ('oia', 1), ('koia', 1), ('aria', 1),
    ('karia', 1), ('laria', 1), ('taria', 1), ('eria', 1), ('keria', 1),
    ('teria', 1), ('garria', 2), ('larria', 1), ('kirria', 1),
    ('duria', 1), ('asia', 1), ('tia', 1), ('ezia', 1), ('bizia', 1),
    ('ontzia', 1), ('ka', 1), ('joka', 3), ('aurka', 10), ('ska', 1),
    ('xka', 1), ('zka', 1), ('gibela', 1), ('gela', 1), ('kaila', 1),
    ('skila', 1), ('tila', 1), ('ola', 1), ('na', 1), ('kana', 1),
    ('ena', 1), ('garrena', 1), ('gerrena', 1), ('urrena', 1),
    ('zaina', 1), ('tzaina', 1), ('kina', 1), ('mina', 1), ('garna', 1),
    ('una', 1), ('duna', 1), ('asuna', 1), ('tasuna', 1), ('ondoa', 1),
    ('kondoa', 1), ('ngoa', 1), ('zioa', 1), ('koa', 1), ('takoa', 1),
    ('zkoa', 1), ('noa', 1), ('zinoa', 1), ('aroa', 1), ('taroa', 1),
    ('zaroa', 1), ('eroa', 1), ('oroa', 1), ('osoa', 1), ('toa', 1),
    ('ttoa', 1), ('ztoa', 1), ('txoa', 1), ('tzoa', 1), ('ñoa', 1),
    ('ra', 1), ('ara', 1), ('dara', 1), ('liara', 1), ('tiara', 1),
    ('tara', 1), ('etara', 1), ('tzara', 1), ('bera', 1), ('kera', 1),
    ('pera', 1), ('ora', 2), ('tzarra', 1), ('korra', 1), ('tra', 1),
    ('sa', 1), ('osa', 1), ('ta', 1), ('eta', 1), ('keta', 1), ('sta', 1),
    ('dua', 1), ('mendua', 1), ('ordua', 1), ('lekua', 1), ('burua', 1),
    ('durua', 1), ('tsua', 1), ('tua', 1), ('mentua', 1), ('estua', 1),
    ('txua', 1), ('zua', 1), ('tzua', 1), ('za', 1), ('eza', 1),
    ('eroza', 1), ('tza', 2), ('koitza', 1), ('antza', 1), ('gintza', 1),
    ('kintza', 1), ('kuntza', 1), ('gabe', 1), ('kabe', 1), ('kide', 1),
    ('alde', 1), ('kalde', 1), ('talde', 1), ('orde', 1), ('ge', 1),
    ('zale', 1), ('tzale', 1), ('gile', 1), ('eme', 1), ('kume', 1),
    ('ne', 1), ('zione', 1), ('une', 1), ('gune', 1), ('pe', 1),
    ('aurre', 1), ('te', 1), ('kote', 1), ('arte', 1), ('oste', 1),
    ('etxe', 1), ('gai', 1), ('di', 1), ('aldi', 1), ('taldi', 1),
    ('geldi', 8), ('handi', 1), ('mendi', 1), ('gei', 1), ('egi', 1),
    ('degi', 1), ('tegi', 1), ('nahi', 1), ('ohi', 1), ('ki', 1),
    ('toki', 1), ('oi', 1), ('goi', 1), ('koi', 1), ('ari', 1),
    ('kari', 1), ('lari', 1), ('tari', 1), ('garri', 2), ('larri', 1),
    ('kirri', 1), ('duri', 1), ('asi', 1), ('ti', 1), ('ontzi', 1),
    ('ñi', 1), ('ak', 1), ('ek', 1), ('tarik', 1), ('gibel', 1),
    ('ail', 1), ('kail', 1), ('kan', 1), ('tan', 1), ('etan', 1),
    ('en', 4), ('ren', 2), ('garren', 1), ('gerren', 1), ('urren', 1),
    ('ten', 4), ('tzen', 4), ('zain', 1), ('tzain', 1), ('kin', 1),
    ('min', 1), ('dun', 1), ('asun', 1), ('tasun', 1), ('aizun', 1),
    ('ondo', 1), ('kondo', 1), ('go', 1), ('ngo', 1), ('zio', 1),
    ('ko', 1), ('trako', 5), ('tako', 1), ('etako', 1), ('eko', 1),
    ('tariko', 1), ('sko', 1), ('tuko', 1), ('minutuko', 6), ('zko', 1),
    ('no', 1), ('zino', 1), ('ro', 1), ('aro', 1), ('igaro', 9),
    ('taro', 1), ('zaro', 1), ('ero', 1), ('giro', 1), ('oro', 1),
    ('oso', 1), ('to', 1), ('tto', 1), ('zto', 1), ('txo', 1), ('tzo', 1),
    ('gintzo', 1), ('ño', 1), ('zp', 1), ('ar', 1), ('dar', 1),
    ('behar', 1), ('zehar', 7), ('liar', 1), ('tiar', 1), ('tar', 1),
    ('tzar', 1), ('or', 2), ('kor', 1), ('os', 1), ('ket', 1), ('du', 1),
    ('mendu', 1), ('ordu', 1), ('leku', 1), ('buru', 2), ('duru', 1),
    ('tsu', 1), ('tu', 1), ('tatu', 4), ('mentu', 1), ('estu', 1),
    ('txu', 1), ('zu', 1), ('tzu', 1), ('gintzu', 1), ('z', 1), ('ez', 1),
    ('eroz', 1), ('tz', 1), ('koitz', 1),
])

EU_VERB = compile_among([
    ('idea', 1), ('bidea', 1), ('kidea', 1), ('pidea', 1), ('kundea', 1),
    ('galea', 1), ('tailea', 1), ('tzailea', 1), ('gunea', 1),
    ('kunea', 1), ('tzaga', 1), ('gaia', 1), ('aldia', 1), ('taldia', 1),
    ('karia', 1), ('garria', 2), ('karria', 1), ('ka', 1), ('tzaka', 1),
    ('la', 1), ('mena', 1), ('pena', 1), ('kina', 1), ('ezina', 1),
    ('tezina', 1), ('kuna', 1), ('tuna', 1), ('kizuna', 1), ('era', 1),
    ('bera', 1), ('arabera', 4), ('kera', 1), ('pera', 1), ('orra', 1),
    ('korra', 1), ('dura', 1), ('gura', 1), ('kura', 1), ('tura', 1),
    ('eta', 1), ('keta', 1), ('gailua', 1), ('eza', 1), ('erreza', 1),
    ('tza', 2), ('gaitza', 1), ('kaitza', 1), ('kuntza', 1), ('ide', 1),
    ('bide', 1), ('kide', 1), ('pide', 1), ('kunde', 1), ('tzake', 1),
    ('tzeke', 1), ('le', 1), ('gale', 1), ('taile', 1), ('tzaile', 1),
    ('gune', 1), ('kune', 1), ('tze', 1), ('atze', 1), ('gai', 1),
    ('aldi', 1), ('taldi', 1), ('ki', 1), ('ari', 1), ('kari', 1),
    ('lari', 1), ('tari', 1), ('etari', 1), ('garri', 2), ('karri', 1),
    ('arazi', 1), ('tarazi', 1), ('an', 1), ('ean', 1), ('rean', 1),
    ('kan', 1), ('etan', 1), ('atseden', 3), ('men', 1), ('pen', 1),
    ('kin', 1), ('rekin', 1), ('ezin', 1), ('tezin', 1), ('tun', 1),
    ('kizun', 1), ('go', 1), ('ago', 1), ('tio', 1), ('dako', 1),
    ('or', 1), ('kor', 1), ('tzat', 1), ('du', 1), ('gailu', 1), ('tu', 1),
    ('atu', 1), ('aldatu', 1), ('tatu', 1), ('baditu', 5), ('ez', 1),
    ('errez', 1), ('tzez', 1), ('gaitz', 1), ('kaitz', 1),
])

# ------------------------------------------------------------------
# Irish (irish.sbl): verb_sfx / noun_sfx / deriv / initial_morph
# ------------------------------------------------------------------
GA_VERB = compile_among([
    ('imid', 1), ('aimid', 1), ('ímid', 1), ('aímid', 1), ('adh', 2),
    ('eadh', 2), ('faidh', 1), ('fidh', 1), ('áil', 2), ('ain', 2),
    ('tear', 2), ('tar', 2),
])

GA_NOUN = compile_among([
    ('óideacha', 6), ('patacha', 5), ('achta', 1), ('arcachta', 2),
    ('eachta', 1), ('grafaíochta', 4), ('paite', 5), ('ach', 1),
    ('each', 1), ('óideach', 6), ('gineach', 3), ('patach', 5),
    ('grafaíoch', 4), ('pataigh', 5), ('óidigh', 6), ('achtúil', 1),
    ('eachtúil', 1), ('gineas', 3), ('ginis', 3), ('acht', 1),
    ('arcacht', 2), ('eacht', 1), ('grafaíocht', 4), ('arcachtaí', 2),
    ('grafaíochtaí', 4),
])

GA_DERIV = compile_among([
    ('íochta', 1), ('aíochta', 1), ('ire', 2), ('aire', 2), ('abh', 1),
    ('eabh', 1), ('ibh', 1), ('aibh', 1), ('amh', 1), ('eamh', 1),
    ('imh', 1), ('aimh', 1), ('íocht', 1), ('aíocht', 1), ('irí', 2),
    ('airí', 2),
])

GA_INIT = compile_among([
    ("b'", 1), ('bh', 4), ('bhf', 2), ('bp', 8), ('ch', 5), ("d'", 1),
    ("d'fh", 2), ('dh', 6), ('dt', 9), ('fh', 2), ('gc', 5), ('gh', 7),
    ('h-', 1), ("m'", 1), ('mb', 4), ('mh', 10), ('n-', 1), ('nd', 6),
    ('ng', 7), ('ph', 8), ('sh', 3), ('t-', 1), ('th', 9), ('ts', 3),
])

# ------------------------------------------------------------------
# Armenian (armenian.sbl): ending / noun / verb / adjective
# ------------------------------------------------------------------
HY_ENDING = compile_among([
    ('եր', 1), ('ներ', 1), ('ց', 1), ('ուց', 1), ('ից', 1), ('երից', 1),
    ('ներից', 1), ('ցից', 1), ('վանից', 1), ('ոջից', 1), ('վից', 1),
    ('ոց', 1), ('սա', 1), ('վա', 1), ('ամբ', 1), ('դ', 1), ('երդ', 1),
    ('ներդ', 1), ('ուդ', 1), ('անդ', 1), ('ությանդ', 1), ('վանդ', 1),
    ('ոջդ', 1), ('ը', 1), ('երը', 1), ('ները', 1), ('անը', 1),
    ('ությանը', 1), ('վանը', 1), ('ոջը', 1), ('ի', 1), ('երի', 1),
    ('ների', 1), ('վի', 1), ('երում', 1), ('ներում', 1), ('անում', 1),
    ('ն', 1), ('երն', 1), ('ներն', 1), ('ուն', 1), ('ան', 1),
    ('ության', 1), ('վան', 1), ('ին', 1), ('երին', 1), ('ներին', 1),
    ('ությանն', 1), ('ոջ', 1), ('ությանս', 1), ('վանս', 1), ('ոջս', 1),
    ('ով', 1), ('երով', 1), ('ներով', 1), ('անով', 1), ('վով', 1),
])

HY_NOUN = compile_among([
    ('գար', 1), ('վոր', 1), ('ավոր', 1), ('անօց', 1), ('ոց', 1), ('ու', 1),
    ('ք', 1), ('արք', 1), ('չեք', 1), ('իք', 1), ('ալիք', 1), ('անիք', 1),
    ('վածք', 1), ('ույք', 1), ('ունք', 1), ('մունք', 1), ('ենք', 1),
    ('ոնք', 1), ('իչք', 1), ('որդ', 1), ('ույթ', 1), ('ցի', 1),
    ('ուհի', 1), ('իլ', 1), ('ուկ', 1), ('ակ', 1), ('յակ', 1), ('անակ', 1),
    ('իկ', 1), ('յուն', 1), ('ություն', 1), ('ան', 1), ('արան', 1),
    ('պան', 1), ('ստան', 1), ('եղէն', 1), ('ածո', 1), ('իչ', 1),
    ('ուս', 1), ('ուստ', 1),
])

HY_VERB = compile_among([
    ('ար', 1), ('ացար', 1), ('եցար', 1), ('ացրիր', 1), ('ացիր', 1),
    ('եցիր', 1), ('վեցիր', 1), ('ալուց', 1), ('ելուց', 1), ('աց', 1),
    ('եց', 1), ('ացրեց', 1), ('ալու', 1), ('ելու', 1), ('աք', 1),
    ('ցաք', 1), ('ացաք', 1), ('ացրիք', 1), ('ացիք', 1), ('եցիք', 1),
    ('վեցիք', 1), ('անք', 1), ('ցանք', 1), ('ացանք', 1), ('ացրինք', 1),
    ('ացինք', 1), ('եցինք', 1), ('վեցինք', 1), ('ա', 1), ('ացա', 1),
    ('եցա', 1), ('վե', 1), ('ացրի', 1), ('ացի', 1), ('եցի', 1),
    ('վեցի', 1), ('ալ', 1), ('ըալ', 1), ('ացնալ', 1), ('անալ', 1),
    ('ենալ', 1), ('ել', 1), ('ըել', 1), ('նել', 1), ('ցնել', 1),
    ('եցնել', 1), ('չել', 1), ('վել', 1), ('ացվել', 1), ('եցվել', 1),
    ('տել', 1), ('ատել', 1), ('ոտել', 1), ('կոտել', 1), ('ված', 1),
    ('ում', 1), ('վում', 1), ('ան', 1), ('ցան', 1), ('ացան', 1),
    ('ացրին', 1), ('ացին', 1), ('եցին', 1), ('վեցին', 1), ('ալիս', 1),
    ('ելիս', 1), ('ավ', 1), ('ացավ', 1), ('եցավ', 1), ('ալով', 1),
    ('ելով', 1),
])

HY_ADJ = compile_among([
    ('բար', 1), ('րորդ', 1), ('երորդ', 1), ('ալի', 1), ('ակի', 1),
    ('որակ', 1), ('եղ', 1), ('վուն', 1), ('արան', 1), ('ական', 1),
    ('են', 1), ('երեն', 1), ('եկեն', 1), ('որէն', 1), ('ին', 1),
    ('գին', 1), ('ովին', 1), ('լայն', 1), ('պես', 1), ('իվ', 1), ('ատ', 1),
    ('ավետ', 1), ('կոտ', 1),
])

# ------------------------------------------------------------------
# Romanian (romanian.sbl, cedilla-era tables as in Snowball 2.x /
# Lucene 8.x): vowel_suffix / verb_suffix / standard_suffix /
# combo_suffix / step_0
# ------------------------------------------------------------------
RO_VOWEL = compile_among([
    ('a', 1), ('e', 1), ('ie', 1), ('i', 1), ('ă', 1),
])

RO_VERB = compile_among([
    ('ea', 1), ('ia', 1), ('esc', 1), ('ăsc', 1), ('ind', 1), ('ând', 1),
    ('are', 1), ('ere', 1), ('ire', 1), ('âre', 1), ('se', 2), ('ase', 1),
    ('sese', 2), ('ise', 1), ('use', 1), ('âse', 1), ('eşte', 1),
    ('ăşte', 1), ('eze', 1), ('ai', 1), ('eai', 1), ('iai', 1), ('sei', 2),
    ('eşti', 1), ('ăşti', 1), ('ui', 1), ('ezi', 1), ('aşi', 1),
    ('seşi', 2), ('aseşi', 1), ('seseşi', 2), ('iseşi', 1), ('useşi', 1),
    ('âseşi', 1), ('işi', 1), ('uşi', 1), ('âşi', 1), ('âi', 1),
    ('aţi', 2), ('eaţi', 1), ('iaţi', 1), ('eţi', 2), ('iţi', 2),
    ('arăţi', 1), ('serăţi', 2), ('aserăţi', 1), ('seserăţi', 2),
    ('iserăţi', 1), ('userăţi', 1), ('âserăţi', 1), ('irăţi', 1),
    ('urăţi', 1), ('ârăţi', 1), ('âţi', 2), ('am', 1), ('eam', 1),
    ('iam', 1), ('em', 2), ('asem', 1), ('sesem', 2), ('isem', 1),
    ('usem', 1), ('âsem', 1), ('im', 2), ('ăm', 2), ('arăm', 1),
    ('serăm', 2), ('aserăm', 1), ('seserăm', 2), ('iserăm', 1),
    ('userăm', 1), ('âserăm', 1), ('irăm', 1), ('urăm', 1), ('ârăm', 1),
    ('âm', 2), ('au', 1), ('eau', 1), ('iau', 1), ('indu', 1), ('ându', 1),
    ('ez', 1), ('ească', 1), ('ară', 1), ('seră', 2), ('aseră', 1),
    ('seseră', 2), ('iseră', 1), ('useră', 1), ('âseră', 1), ('iră', 1),
    ('ură', 1), ('âră', 1), ('ează', 1),
])

RO_STD = compile_among([
    ('ica', 1), ('abila', 1), ('ibila', 1), ('oasa', 1), ('ata', 1),
    ('ita', 1), ('anta', 1), ('ista', 3), ('uta', 1), ('iva', 1),
    ('ic', 1), ('ice', 1), ('abile', 1), ('ibile', 1), ('isme', 3),
    ('iune', 2), ('oase', 1), ('ate', 1), ('itate', 1), ('ite', 1),
    ('ante', 1), ('iste', 3), ('ute', 1), ('ive', 1), ('ici', 1),
    ('abili', 1), ('ibili', 1), ('iuni', 2), ('atori', 1), ('osi', 1),
    ('ati', 1), ('itati', 1), ('iti', 1), ('anti', 1), ('isti', 3),
    ('uti', 1), ('işti', 3), ('ivi', 1), ('ităi', 1), ('oşi', 1),
    ('ităţi', 1), ('abil', 1), ('ibil', 1), ('ism', 3), ('ator', 1),
    ('os', 1), ('at', 1), ('it', 1), ('ant', 1), ('ist', 3), ('ut', 1),
    ('iv', 1), ('ică', 1), ('abilă', 1), ('ibilă', 1), ('oasă', 1),
    ('ată', 1), ('ită', 1), ('antă', 1), ('istă', 3), ('ută', 1),
    ('ivă', 1),
])

RO_COMBO = compile_among([
    ('icala', 4), ('iciva', 4), ('ativa', 5), ('itiva', 6), ('icale', 4),
    ('aţiune', 5), ('iţiune', 6), ('atoare', 5), ('itoare', 6),
    ('ătoare', 5), ('icitate', 4), ('abilitate', 1), ('ibilitate', 2),
    ('ivitate', 3), ('icive', 4), ('ative', 5), ('itive', 6), ('icali', 4),
    ('atori', 5), ('icatori', 4), ('itori', 6), ('ători', 5),
    ('icitati', 4), ('abilitati', 1), ('ivitati', 3), ('icivi', 4),
    ('ativi', 5), ('itivi', 6), ('icităi', 4), ('abilităi', 1),
    ('ivităi', 3), ('icităţi', 4), ('abilităţi', 1), ('ivităţi', 3),
    ('ical', 4), ('ator', 5), ('icator', 4), ('itor', 6), ('ător', 5),
    ('iciv', 4), ('ativ', 5), ('itiv', 6), ('icală', 4), ('icivă', 4),
    ('ativă', 5), ('itivă', 6),
])

RO_STEP0 = compile_among([
    ('ea', 3), ('aţia', 7), ('aua', 2), ('iua', 4), ('aţie', 7),
    ('ele', 3), ('ile', 5), ('iile', 4), ('iei', 4), ('atei', 6),
    ('ii', 4), ('ului', 1), ('ul', 1), ('elor', 3), ('ilor', 4),
    ('iilor', 4),
])

# ------------------------------------------------------------------
# Catalan (catalan.sbl): residual_suffix / verb_suffix /
# standard_suffix / attached_pronoun
# ------------------------------------------------------------------
CA_RESID = compile_among([
    ('a', 1), ('e', 1), ('i', 1), ('ïn', 1), ('o', 1), ('ir', 1), ('s', 1),
    ('is', 1), ('os', 1), ('ïs', 1), ('it', 1), ('eu', 1), ('iu', 1),
    ('iqu', 2), ('itz', 1), ('à', 1), ('á', 1), ('é', 1), ('ì', 1),
    ('í', 1), ('ï', 1), ('ó', 1),
])

CA_VERB = compile_among([
    ('aba', 1), ('esca', 1), ('isca', 1), ('ïsca', 1), ('ada', 1),
    ('ida', 1), ('uda', 1), ('ïda', 1), ('ia', 1), ('aria', 1),
    ('iria', 1), ('ara', 1), ('iera', 1), ('ira', 1), ('adora', 1),
    ('ïra', 1), ('ava', 1), ('ixa', 1), ('itza', 1), ('ía', 1),
    ('aría', 1), ('ería', 1), ('iría', 1), ('ïa', 1), ('isc', 1),
    ('ïsc', 1), ('ad', 1), ('ed', 1), ('id', 1), ('ie', 1), ('re', 1),
    ('dre', 1), ('ase', 1), ('iese', 1), ('aste', 1), ('iste', 1),
    ('ii', 1), ('ini', 1), ('esqui', 1), ('eixi', 1), ('itzi', 1),
    ('am', 1), ('em', 1), ('arem', 1), ('irem', 1), ('àrem', 1),
    ('írem', 1), ('àssem', 1), ('éssem', 1), ('iguem', 1), ('ïguem', 1),
    ('avem', 1), ('àvem', 1), ('ávem', 1), ('irìem', 1), ('íem', 1),
    ('aríem', 1), ('iríem', 1), ('assim', 1), ('essim', 1), ('issim', 1),
    ('àssim', 1), ('èssim', 1), ('éssim', 1), ('íssim', 1), ('ïm', 1),
    ('an', 1), ('aban', 1), ('arian', 1), ('aran', 1), ('ieran', 1),
    ('iran', 1), ('ían', 1), ('arían', 1), ('erían', 1), ('irían', 1),
    ('en', 1), ('ien', 1), ('arien', 1), ('irien', 1), ('aren', 1),
    ('eren', 1), ('iren', 1), ('àren', 1), ('ïren', 1), ('asen', 1),
    ('iesen', 1), ('assen', 1), ('essen', 1), ('issen', 1), ('éssen', 1),
    ('ïssen', 1), ('esquen', 1), ('isquen', 1), ('ïsquen', 1), ('aven', 1),
    ('ixen', 1), ('eixen', 1), ('ïxen', 1), ('ïen', 1), ('in', 1),
    ('inin', 1), ('sin', 1), ('isin', 1), ('assin', 1), ('essin', 1),
    ('issin', 1), ('ïssin', 1), ('esquin', 1), ('eixin', 1), ('aron', 1),
    ('ieron', 1), ('arán', 1), ('erán', 1), ('irán', 1), ('iïn', 1),
    ('ado', 1), ('ido', 1), ('ando', 2), ('iendo', 1), ('io', 1),
    ('ixo', 1), ('eixo', 1), ('ïxo', 1), ('itzo', 1), ('ar', 1),
    ('tzar', 1), ('er', 1), ('eixer', 1), ('ir', 1), ('ador', 1),
    ('as', 1), ('abas', 1), ('adas', 1), ('idas', 1), ('aras', 1),
    ('ieras', 1), ('ías', 1), ('arías', 1), ('erías', 1), ('irías', 1),
    ('ids', 1), ('es', 1), ('ades', 1), ('ides', 1), ('udes', 1),
    ('ïdes', 1), ('atges', 1), ('ies', 1), ('aries', 1), ('iries', 1),
    ('ares', 1), ('ires', 1), ('adores', 1), ('ïres', 1), ('ases', 1),
    ('ieses', 1), ('asses', 1), ('esses', 1), ('isses', 1), ('ïsses', 1),
    ('ques', 1), ('esques', 1), ('ïsques', 1), ('aves', 1), ('ixes', 1),
    ('eixes', 1), ('ïxes', 1), ('ïes', 1), ('abais', 1), ('arais', 1),
    ('ierais', 1), ('íais', 1), ('aríais', 1), ('eríais', 1),
    ('iríais', 1), ('aseis', 1), ('ieseis', 1), ('asteis', 1),
    ('isteis', 1), ('inis', 1), ('sis', 1), ('isis', 1), ('assis', 1),
    ('essis', 1), ('issis', 1), ('ïssis', 1), ('esquis', 1), ('eixis', 1),
    ('itzis', 1), ('áis', 1), ('aréis', 1), ('eréis', 1), ('iréis', 1),
    ('ams', 1), ('ados', 1), ('idos', 1), ('amos', 1), ('ábamos', 1),
    ('áramos', 1), ('iéramos', 1), ('íamos', 1), ('aríamos', 1),
    ('eríamos', 1), ('iríamos', 1), ('aremos', 1), ('eremos', 1),
    ('iremos', 1), ('ásemos', 1), ('iésemos', 1), ('imos', 1),
    ('adors', 1), ('ass', 1), ('erass', 1), ('ess', 1), ('ats', 1),
    ('its', 1), ('ents', 1), ('às', 1), ('aràs', 1), ('iràs', 1),
    ('arás', 1), ('erás', 1), ('irás', 1), ('és', 1), ('arés', 1),
    ('ís', 1), ('iïs', 1), ('at', 1), ('it', 1), ('ant', 1), ('ent', 1),
    ('int', 1), ('ut', 1), ('ït', 1), ('au', 1), ('erau', 1), ('ieu', 1),
    ('ineu', 1), ('areu', 1), ('ireu', 1), ('àreu', 1), ('íreu', 1),
    ('asseu', 1), ('esseu', 1), ('eresseu', 1), ('àsseu', 1), ('ésseu', 1),
    ('igueu', 1), ('ïgueu', 1), ('àveu', 1), ('áveu', 1), ('itzeu', 1),
    ('ìeu', 1), ('irìeu', 1), ('íeu', 1), ('aríeu', 1), ('iríeu', 1),
    ('assiu', 1), ('issiu', 1), ('àssiu', 1), ('èssiu', 1), ('éssiu', 1),
    ('íssiu', 1), ('ïu', 1), ('ix', 1), ('eix', 1), ('ïx', 1), ('itz', 1),
    ('ià', 1), ('arà', 1), ('irà', 1), ('itzà', 1), ('ará', 1), ('erá', 1),
    ('irá', 1), ('irè', 1), ('aré', 1), ('eré', 1), ('iré', 1), ('í', 1),
    ('iï', 1), ('ió', 1),
])

CA_STD = compile_among([
    ('ica', 4), ('lógica', 3), ('enca', 1), ('ada', 2), ('ancia', 1),
    ('encia', 1), ('ència', 1), ('ícia', 1), ('logia', 3), ('inia', 1),
    ('íinia', 1), ('eria', 1), ('ària', 1), ('atòria', 1), ('alla', 1),
    ('ella', 1), ('ívola', 1), ('ima', 1), ('íssima', 1), ('quíssima', 5),
    ('ana', 1), ('ina', 1), ('era', 1), ('sfera', 1), ('ora', 1),
    ('dora', 1), ('adora', 1), ('adura', 1), ('esa', 1), ('osa', 1),
    ('assa', 1), ('essa', 1), ('issa', 1), ('eta', 1), ('ita', 1),
    ('ota', 1), ('ista', 1), ('ialista', 1), ('ionista', 1), ('iva', 1),
    ('ativa', 1), ('nça', 1), ('logía', 3), ('ic', 4), ('ístic', 1),
    ('enc', 1), ('esc', 1), ('ud', 1), ('atge', 1), ('ble', 1),
    ('able', 1), ('ible', 1), ('isme', 1), ('ialisme', 1), ('ionisme', 1),
    ('ivisme', 1), ('aire', 1), ('icte', 1), ('iste', 1), ('ici', 1),
    ('íci', 1), ('logi', 3), ('ari', 1), ('tori', 1), ('al', 1), ('il', 1),
    ('all', 1), ('ell', 1), ('ívol', 1), ('isam', 1), ('issem', 1),
    ('ìssem', 1), ('íssem', 1), ('íssim', 1), ('quíssim', 5), ('amen', 1),
    ('ìssin', 1), ('ar', 1), ('ificar', 1), ('egar', 1), ('ejar', 1),
    ('itar', 1), ('itzar', 1), ('fer', 1), ('or', 1), ('dor', 1),
    ('dur', 1), ('doras', 1), ('ics', 4), ('lógics', 3), ('uds', 1),
    ('nces', 1), ('ades', 2), ('ancies', 1), ('encies', 1), ('ències', 1),
    ('ícies', 1), ('logies', 3), ('inies', 1), ('ínies', 1), ('eries', 1),
    ('àries', 1), ('atòries', 1), ('bles', 1), ('ables', 1), ('ibles', 1),
    ('imes', 1), ('íssimes', 1), ('quíssimes', 5), ('formes', 1),
    ('ismes', 1), ('ialismes', 1), ('ines', 1), ('eres', 1), ('ores', 1),
    ('dores', 1), ('idores', 1), ('dures', 1), ('eses', 1), ('oses', 1),
    ('asses', 1), ('ictes', 1), ('ites', 1), ('otes', 1), ('istes', 1),
    ('ialistes', 1), ('ionistes', 1), ('iques', 4), ('lógiques', 3),
    ('ives', 1), ('atives', 1), ('logíes', 3), ('allengües', 1),
    ('icis', 1), ('ícis', 1), ('logis', 3), ('aris', 1), ('toris', 1),
    ('ls', 1), ('als', 1), ('ells', 1), ('ims', 1), ('íssims', 1),
    ('quíssims', 5), ('ions', 1), ('cions', 1), ('acions', 2), ('esos', 1),
    ('osos', 1), ('assos', 1), ('issos', 1), ('ers', 1), ('ors', 1),
    ('dors', 1), ('adors', 1), ('idors', 1), ('ats', 1), ('itats', 1),
    ('bilitats', 1), ('ivitats', 1), ('ativitats', 1), ('ïtats', 1),
    ('ets', 1), ('ants', 1), ('ents', 1), ('ments', 1), ('aments', 1),
    ('ots', 1), ('uts', 1), ('ius', 1), ('trius', 1), ('atius', 1),
    ('ès', 1), ('és', 1), ('ís', 1), ('dís', 1), ('ós', 1), ('itat', 1),
    ('bilitat', 1), ('ivitat', 1), ('ativitat', 1), ('ïtat', 1), ('et', 1),
    ('ant', 1), ('ent', 1), ('ient', 1), ('ment', 1), ('ament', 1),
    ('isament', 1), ('ot', 1), ('isseu', 1), ('ìsseu', 1), ('ísseu', 1),
    ('triu', 1), ('íssiu', 1), ('atiu', 1), ('ó', 1), ('ió', 1),
    ('ció', 1), ('ació', 1),
])

CA_PRON = compile_among([
    ('la', 1), ('-la', 1), ('sela', 1), ('le', 1), ('me', 1), ('-me', 1),
    ('se', 1), ('-te', 1), ('hi', 1), ("'hi", 1), ('li', 1), ('-li', 1),
    ("'l", 1), ("'m", 1), ('-m', 1), ("'n", 1), ('-n', 1), ('ho', 1),
    ("'ho", 1), ('lo', 1), ('selo', 1), ("'s", 1), ('las', 1),
    ('selas', 1), ('les', 1), ('-les', 1), ("'ls", 1), ('-ls', 1),
    ("'ns", 1), ('-ns', 1), ('ens', 1), ('los', 1), ('selos', 1),
    ('nos', 1), ('-nos', 1), ('vos', 1), ('us', 1), ('-us', 1), ("'t", 1),
])


# ------------------------------------------------------------------
# Arabic (arabic.sbl): normalization, Checks1, verb/noun suffix
# steps with word-length conditions, prefix steps. The generated
# among tables for single-entry routines are inlined in
# snowball_misc.py; the two big normalization tables live here.
# ------------------------------------------------------------------
# Normalize_pre: tatweel/diacritic deletion (1), Arabic-Indic digit
# mapping (2-11), presentation-form folding (12-51)
AR_NORM_PRE = compile_among([
    ('آ', 1), ('أ', 1), ('ؤ', 1), ('إ', 1), ('ئ', 1), ('ـ', 1), ('ً', 1),
    ('ٌ', 1), ('ٍ', 1), ('َ', 1), ('ُ', 1), ('ِ', 1), ('ّ', 1), ('ْ', 1),
    ('٠', 2), ('١', 3), ('٢', 4), ('٣', 5), ('٤', 6), ('٥', 7), ('٦', 8),
    ('٧', 9), ('٨', 10), ('٩', 11), ('ﺀ', 12), ('ﺁ', 16), ('ﺂ', 16),
    ('ﺃ', 13), ('ﺄ', 13), ('ﺅ', 17), ('ﺆ', 17), ('ﺇ', 14), ('ﺈ', 14),
    ('ﺉ', 15), ('ﺊ', 15), ('ﺋ', 15), ('ﺌ', 15), ('ﺍ', 18), ('ﺎ', 18),
    ('ﺏ', 19), ('ﺐ', 19), ('ﺑ', 19), ('ﺒ', 19), ('ﺓ', 20), ('ﺔ', 20),
    ('ﺕ', 21), ('ﺖ', 21), ('ﺗ', 21), ('ﺘ', 21), ('ﺙ', 22), ('ﺚ', 22),
    ('ﺛ', 22), ('ﺜ', 22), ('ﺝ', 23), ('ﺞ', 23), ('ﺟ', 23), ('ﺠ', 23),
    ('ﺡ', 24), ('ﺢ', 24), ('ﺣ', 24), ('ﺤ', 24), ('ﺥ', 25), ('ﺦ', 25),
    ('ﺧ', 25), ('ﺨ', 25), ('ﺩ', 26), ('ﺪ', 26), ('ﺫ', 27), ('ﺬ', 27),
    ('ﺭ', 28), ('ﺮ', 28), ('ﺯ', 29), ('ﺰ', 29), ('ﺱ', 30), ('ﺲ', 30),
    ('ﺳ', 30), ('ﺴ', 30), ('ﺵ', 31), ('ﺶ', 31), ('ﺷ', 31), ('ﺸ', 31),
    ('ﺹ', 32), ('ﺺ', 32), ('ﺻ', 32), ('ﺼ', 32), ('ﺽ', 33), ('ﺾ', 33),
    ('ﺿ', 33), ('ﻀ', 33), ('ﻁ', 34), ('ﻂ', 34), ('ﻃ', 34), ('ﻄ', 34),
    ('ﻅ', 35), ('ﻆ', 35), ('ﻇ', 35), ('ﻈ', 35), ('ﻉ', 36), ('ﻊ', 36),
    ('ﻋ', 36), ('ﻌ', 36), ('ﻍ', 37), ('ﻎ', 37), ('ﻏ', 37), ('ﻐ', 37),
    ('ﻑ', 38), ('ﻒ', 38), ('ﻓ', 38), ('ﻔ', 38), ('ﻕ', 39), ('ﻖ', 39),
    ('ﻗ', 39), ('ﻘ', 39), ('ﻙ', 40), ('ﻚ', 40), ('ﻛ', 40), ('ﻜ', 40),
    ('ﻝ', 41), ('ﻞ', 41), ('ﻟ', 41), ('ﻠ', 41), ('ﻡ', 42), ('ﻢ', 42),
    ('ﻣ', 42), ('ﻤ', 42), ('ﻥ', 43), ('ﻦ', 43), ('ﻧ', 43), ('ﻨ', 43),
    ('ﻩ', 44), ('ﻪ', 44), ('ﻫ', 44), ('ﻬ', 44), ('ﻭ', 45), ('ﻮ', 45),
    ('ﻯ', 46), ('ﻰ', 46), ('ﻱ', 47), ('ﻲ', 47), ('ﻳ', 47), ('ﻴ', 47),
    ('ﻵ', 51), ('ﻶ', 51), ('ﻷ', 49), ('ﻸ', 49), ('ﻹ', 50), ('ﻺ', 50),
    ('ﻻ', 48), ('ﻼ', 48),
])
# ------------------------------------------------------------------
# Lithuanian (lithuanian.sbl): step2 / step1 ending tables
# ------------------------------------------------------------------
LT_STEP2 = compile_among([
    ('ing', -1), ('aj', -1), ('iaj', -1), ('iej', -1), ('oj', -1),
    ('ioj', -1), ('uoj', -1), ('iuoj', -1), ('auj', -1), ('ąj', -1),
    ('iąj', -1), ('ėj', -1), ('ųj', -1), ('iųj', -1), ('ok', -1),
    ('iok', -1), ('iuk', -1), ('uliuk', -1), ('učiuk', -1), ('išk', -1),
    ('iul', -1), ('yl', -1), ('ėl', -1), ('am', -1), ('dam', -1),
    ('jam', -1), ('zgan', -1), ('ain', -1), ('esn', -1), ('op', -1),
    ('iop', -1), ('ias', -1), ('ies', -1), ('ais', -1), ('iais', -1),
    ('os', -1), ('ios', -1), ('uos', -1), ('iuos', -1), ('aus', -1),
    ('iaus', -1), ('ąs', -1), ('iąs', -1), ('ęs', -1), ('utėait', -1),
    ('ant', -1), ('iant', -1), ('siant', -1), ('int', -1), ('ot', -1),
    ('uot', -1), ('iuot', -1), ('yt', -1), ('ėt', -1), ('ykšt', -1),
    ('iau', -1), ('dav', -1), ('sv', -1), ('šv', -1), ('ykšč', -1),
    ('ę', -1), ('ėję', -1),
])

LT_STEP1 = compile_among([
    ('a', -1), ('ia', -1), ('eria', -1), ('osna', -1), ('iosna', -1),
    ('uosna', -1), ('iuosna', -1), ('ysna', -1), ('ėsna', -1), ('e', -1),
    ('ie', -1), ('enie', -1), ('erie', -1), ('oje', -1), ('ioje', -1),
    ('uje', -1), ('iuje', -1), ('yje', -1), ('enyje', -1), ('eryje', -1),
    ('ėje', -1), ('ame', -1), ('iame', -1), ('sime', -1), ('ome', -1),
    ('ėme', -1), ('tumėme', -1), ('ose', -1), ('iose', -1), ('uose', -1),
    ('iuose', -1), ('yse', -1), ('enyse', -1), ('eryse', -1), ('ėse', -1),
    ('ate', -1), ('iate', -1), ('ite', -1), ('kite', -1), ('site', -1),
    ('ote', -1), ('tute', -1), ('ėte', -1), ('tumėte', -1), ('i', -1),
    ('ai', -1), ('iai', -1), ('eriai', -1), ('ei', -1), ('tumei', -1),
    ('ki', -1), ('imi', -1), ('erimi', -1), ('umi', -1), ('iumi', -1),
    ('si', -1), ('asi', -1), ('iasi', -1), ('esi', -1), ('iesi', -1),
    ('siesi', -1), ('isi', -1), ('aisi', -1), ('eisi', -1),
    ('tumeisi', -1), ('uisi', -1), ('osi', -1), ('ėjosi', -1),
    ('uosi', -1), ('iuosi', -1), ('siuosi', -1), ('usi', -1), ('ausi', -1),
    ('čiausi', -1), ('ąsi', -1), ('ėsi', -1), ('ųsi', -1), ('tųsi', -1),
    ('ti', -1), ('enti', -1), ('inti', -1), ('oti', -1), ('ioti', -1),
    ('uoti', -1), ('iuoti', -1), ('auti', -1), ('iauti', -1), ('yti', -1),
    ('ėti', -1), ('telėti', -1), ('inėti', -1), ('terėti', -1), ('ui', -1),
    ('iui', -1), ('eniui', -1), ('oj', -1), ('ėj', -1), ('k', -1),
    ('am', -1), ('iam', -1), ('iem', -1), ('im', -1), ('sim', -1),
    ('om', -1), ('tum', -1), ('ėm', -1), ('tumėm', -1), ('an', -1),
    ('on', -1), ('ion', -1), ('un', -1), ('iun', -1), ('ėn', -1),
    ('o', -1), ('io', -1), ('enio', -1), ('ėjo', -1), ('uo', -1),
    ('s', -1), ('as', -1), ('ias', -1), ('es', -1), ('ies', -1),
    ('is', -1), ('ais', -1), ('iais', -1), ('tumeis', -1), ('imis', -1),
    ('enimis', -1), ('omis', -1), ('iomis', -1), ('umis', -1),
    ('ėmis', -1), ('enis', -1), ('asis', -1), ('ysis', -1), ('ams', -1),
    ('iams', -1), ('iems', -1), ('ims', -1), ('enims', -1), ('erims', -1),
    ('oms', -1), ('ioms', -1), ('ums', -1), ('ėms', -1), ('ens', -1),
    ('os', -1), ('ios', -1), ('uos', -1), ('iuos', -1), ('ers', -1),
    ('us', -1), ('aus', -1), ('iaus', -1), ('ius', -1), ('ys', -1),
    ('enys', -1), ('erys', -1), ('ąs', -1), ('iąs', -1), ('ės', -1),
    ('amės', -1), ('iamės', -1), ('imės', -1), ('kimės', -1),
    ('simės', -1), ('omės', -1), ('ėmės', -1), ('tumėmės', -1),
    ('atės', -1), ('iatės', -1), ('sitės', -1), ('otės', -1), ('ėtės', -1),
    ('tumėtės', -1), ('ūs', -1), ('įs', -1), ('tųs', -1), ('at', -1),
    ('iat', -1), ('it', -1), ('sit', -1), ('ot', -1), ('ėt', -1),
    ('tumėt', -1), ('u', -1), ('au', -1), ('iau', -1), ('čiau', -1),
    ('iu', -1), ('eniu', -1), ('siu', -1), ('y', -1), ('ą', -1),
    ('ią', -1), ('ė', -1), ('ę', -1), ('į', -1), ('enį', -1), ('erį', -1),
    ('ų', -1), ('ių', -1), ('erų', -1),
])

