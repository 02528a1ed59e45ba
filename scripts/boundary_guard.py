#!/usr/bin/env python3
"""Rounding-boundary guard for oracle columns derived from doubles.

The round-4 incident: q92 hashed CAST(stddev_samp(l_extendedprice) AS
DECIMAL(18,4)) and the true value sat 7e-11 RELATIVE above its 4-dp
round-half boundary — engine/thread/merge-order last-ulp noise flipped the
rounded value on the driver's machine while every local run passed.

This guard re-computes, for every oracle column that rounds or decimal-casts
a double, the FULL-PRECISION value in DuckDB and asserts it is comfortably
far from its nearest round-half boundary. A value v rounded at k decimal
places flips when cross-engine noise exceeds its distance to the boundary:
    danger = |frac(v * 10^k) - 0.5| / 10^k          (absolute, value units)
We require danger >= max(REL_TOL * |v|, ABS_FLOOR). REL_TOL = 1e-9 is ~100x
the worst double-fold noise observed; it also structurally rejects rounding
large-magnitude folds at fine scales (|v| ~ 3e4 at 4 dp can never clear it),
which is exactly the class of column that must not be hashed.

EXACT ties (danger == 0 with frac(v*10^k) == 0.5 exactly) are SAFE, not
fatal: the double sits bit-exactly on the boundary (e.g. q28's stop_ratio
3/32 = 0.09375 — a dyadic ratio computed by one exact division in both
engines), so there is no noise to flip it, and Spark's HALF_UP and DuckDB's
half-away-from-zero agree on every exact tie. The fragile class is
NEAR-boundary (noise can cross it), not ON-boundary.

REGISTRY below must gain a probe whenever a new oracle query rounds a
double. Probes cover every row the hashed column can contain (or a
superset); each probe's SQL yields full-precision doubles in column `v`.

Usage: boundary_guard.py <sfDir> [probe_name ...]     (default: all probes)
Exit 0 iff no probed value straddles its boundary.
"""
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

REL_TOL = 1e-9
ABS_FLOOR = 1e-13

def _stopwords():
    # Mirror of graft.llm.TextAnalysis.DefaultStopwords (keep in sync).
    return ["the", "a", "and", "of"]


def _in_list(words):
    return ", ".join("'" + w + "'" for w in words)


# The spread() profiler queries (q90/q92/q96) carry NO probes by design
# (ADVICE r9 adjudication): every statistic they hash is merge-order-free
# by construction — counts, order-free min/max, and EXACT decimal folds
# for the moments (sum_d/sumsq_d are DECIMAL(38,*) sums, associative in
# scaled-integer space) — so a partition-count change (spread's round-robin
# exchange) cannot move any hashed value by even an ULP. q118's rounded
# ORDER-STATISTICS (med/mad) are the only spread-affected rounding sites
# and carry probes below.
REGISTRY = {
    "q02.avg_disc": (4, """
        SELECT avg(l_discount) AS v FROM lineitem
        GROUP BY l_returnflag, l_linestatus"""),
    "q22.avg_chars": (2, """
        SELECT avg(n_chars) AS v FROM documents
        WHERE n_chars >= 100 GROUP BY lang"""),
    "q38.p25": (4, """
        SELECT quantile_cont(l_quantity, 0.25) AS v FROM lineitem
        GROUP BY l_returnflag"""),
    "q38.p50": (4, """
        SELECT quantile_cont(l_quantity, 0.5) AS v FROM lineitem
        GROUP BY l_returnflag"""),
    "q38.p75": (4, """
        SELECT quantile_cont(l_quantity, 0.75) AS v FROM lineitem
        GROUP BY l_returnflag"""),
    # q272's cosine ranks order by the ROUNDED sim over the %50 query
    # set — a different domain from q26's vec_id<3 probe; every scorable
    # pair is rank-relevant (no threshold filter to restrict the domain)
    "q272.cos_sim": (4, """
        WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qe
                   FROM embeddings WHERE vec_id % 50 = 0),
        c AS (SELECT vec_id, embedding::DOUBLE[] AS ce FROM embeddings)
        SELECT list_dot_product(qe, ce)
               / sqrt(list_dot_product(qe, qe) * list_dot_product(ce, ce)) AS v
        FROM q JOIN c ON vec_id <> q_id"""),
    "q26.sim": (4, """
        WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qe
                   FROM embeddings WHERE vec_id < 3),
        c AS (SELECT vec_id, embedding::DOUBLE[] AS ce FROM embeddings)
        SELECT list_dot_product(qe, ce)
               / sqrt(list_dot_product(qe, qe) * list_dot_product(ce, ce)) AS v
        FROM q JOIN c ON vec_id <> q_id"""),
    # covers q44 AND q47a (whose candidate pairs are a subset of all
    # pairs). Domain-restricted to v >= 0.29994: kept rows are >= 0.3
    # ROUNDED i.e. full-precision >= 0.29995, and the extra 1e-5 covers
    # the filter's own decision window; values below it cannot affect the
    # output (both roundings stay under the cut). The UNRESTRICTED
    # all-pairs probe false-positives: the sf0.1 fixture's ~2M cosines put
    # ~6 values inside the tolerance window, ALL below 0.26, in rows the
    # hashed set structurally cannot contain.
    "q44.cos_sim": (4, """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                          list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS n
                   FROM embeddings)
        SELECT s FROM (
          SELECT list_dot_product(a.v, b.v) / sqrt(a.n * b.n) AS s
          FROM e a JOIN e b ON a.vec_id < b.vec_id)
        WHERE s >= 0.29994"""),
    # q35a's rounded L2 rerank over its TRUE candidate domain: the probe
    # replays the oracle's own fixed-plane bucketing (plane literals are
    # seed-pinned constants shared with LlmQueries.q35a) and checks full-
    # precision distances of bucketed candidates <= 1.20006: kept rows are
    # <= 1.2 ROUNDED i.e. full-precision < 1.20005, and the extra 1e-5
    # covers the filter's own decision window. Values beyond it cannot
    # affect the output (both roundings of a near-boundary 1.2067 stay
    # above the cut), and an all-pairs superset false-positives on
    # verified non-candidates.
    "q35a.dist": (4, """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                  list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS n
           FROM embeddings),
sig AS (SELECT vec_id, v, n,
               [CAST(floor(list_dot_product(v, [1.1419053077697754, 0.9194079637527466, -0.9498666524887085, -1.1069903373718262, 0.28097763657569885, 0.6846228241920471, -0.8172214031219482, -1.3966434001922607, -0.19094450771808624, 1.4862134456634521, 0.80230712890625, -0.12151292711496353, 1.410506248474121, -0.6402328014373779, -1.2096444368362427, 0.35375770926475525, -0.4903496503829956, 0.5507215261459351, -1.2035510540008545, 0.3210160732269287, 1.5511475801467896, 0.438530296087265, 0.48159804940223694, 1.519631028175354, -0.276831716299057, -0.08393897861242294, 1.2558330297470093, -0.325272798538208, -0.17329032719135284, -1.8585851192474365, 1.42380690574646, -1.363726019859314, -1.9646661281585693, -0.9185948371887207, -2.5488874912261963, -1.6309607028961182, -0.12200477719306946, 1.2891590595245361, -0.2691388428211212, 0.25749140977859497, -0.3199143707752228, -1.7684998512268066, -0.483450323343277, -0.5099904537200928, 1.1166733503341675, -0.04094720259308815, -1.1076714992523193, 1.862321376800537, 1.1457411050796509, -1.0586771965026855, 1.072599172592163, -1.93174409866333, 0.3010252118110657, 0.24752315878868103, 1.4061568975448608, -1.5202207565307617, 0.2709294259548187, 0.5612492561340332, -0.5298295617103577, 0.5390222072601318, 2.2123401165008545, -0.6329335570335388, -1.8831759691238403, 0.3865659832954407]::DOUBLE[]) / 1.5) AS BIGINT), CAST(floor(list_dot_product(v, [0.32582926750183105, -0.901304304599762, -0.002680308884009719, -0.4739592671394348, -0.5479781627655029, -0.019100148230791092, 1.646816372871399, -1.107062578201294, 0.5938103795051575, -0.1556646227836609, 0.6632872819900513, 1.2267934083938599, 0.8839698433876038, 0.22172453999519348, 0.9197021126747131, -0.7393758296966553, 0.803517758846283, -0.25394174456596375, -0.7638388872146606, -1.8645567893981934, -1.8613061904907227, -0.5765998959541321, -0.40899381041526794, 0.24846093356609344, -0.4809129536151886, 0.4462120532989502, -0.4465889036655426, 0.045638687908649445, 0.7045662999153137, -0.27182403206825256, 0.0807487815618515, 1.2590965032577515, 0.7635098099708557, 1.7220810651779175, 0.145950049161911, -0.9946630001068115, 0.20074962079524994, 0.8962364196777344, 1.5117192268371582, -1.4034737348556519, -1.906969666481018, 1.3685654401779175, -0.559673011302948, 0.7446081638336182, 1.5736656188964844, 1.1280434131622314, -0.19208158552646637, -2.2544937133789062, 0.439851850271225, 0.6568003296852112, -0.7449501752853394, 1.1994752883911133, 1.7797467708587646, 0.06740415096282959, 1.2950639724731445, -0.5826765298843384, 0.7688682675361633, 0.4176645576953888, -0.4690922498703003, 0.4141481816768646, 0.6630227565765381, 0.867194652557373, 0.2967008650302887, 0.3215230703353882]::DOUBLE[]) / 1.5) AS BIGINT), CAST(floor(list_dot_product(v, [2.2242953777313232, 0.8358482122421265, -1.1933022737503052, 0.11880514770746231, 0.5580410361289978, -1.952710509300232, 1.4960553646087646, -0.7625821828842163, 0.8951776623725891, -0.18267090618610382, 0.9297634363174438, -0.4374803602695465, -0.1049109399318695, -0.6114382147789001, 0.35276466608047485, -1.1445165872573853, -0.6538317799568176, 2.6770970821380615, 0.15132170915603638, 1.8470371961593628, 0.4407433271408081, 0.8773090839385986, 0.9469807147979736, -0.6997736692428589, -2.3152072429656982, 0.09480020403862, 0.19203710556030273, -1.0081307888031006, -2.150717258453369, 1.6170415878295898, 0.5473509430885315, 1.6230096817016602, 0.3696692883968353, 1.2240526676177979, 0.8751209378242493, -0.2900044322013855, 0.4333345293998718, 1.0069743394851685, 1.783008098602295, 1.3568702936172485, 0.44593024253845215, 1.3915127515792847, 0.032955415546894073, -0.8018248677253723, -0.01718263328075409, -1.3164854049682617, -0.027818555012345314, 1.9719833135604858, 1.3758680820465088, -1.270689845085144, 0.2920337915420532, 1.5333192348480225, 0.10462042689323425, -1.3131604194641113, 1.7799965143203735, 0.3952547609806061, -0.5004628300666809, -2.0407392978668213, 1.0869289636611938, -1.0408490896224976, 1.961658239364624, 0.9258632063865662, 1.361656904220581, 2.8896524906158447]::DOUBLE[]) / 1.5) AS BIGINT)] AS k0,
               [CAST(floor(list_dot_product(v, [-0.49101367592811584, -0.7101985812187195, 1.5704667568206787, -0.8424084782600403, -0.3319307565689087, -1.6988476514816284, -0.5311415195465088, -2.5875630378723145, 0.3015645146369934, -1.1528053283691406, -1.71332848072052, 0.08131975680589676, -1.3278611898422241, 0.6965861916542053, -1.2876713275909424, 1.2509058713912964, 0.012552199885249138, 0.6566975116729736, -1.3213529586791992, 0.8149172067642212, 0.6110409498214722, 0.1234808936715126, 0.3884025812149048, -0.5821272134780884, 0.43343567848205566, -0.7960430979728699, 0.06399530172348022, -0.742111086845398, 1.1806635856628418, 0.9198185801506042, 1.2380051612854004, -0.07088550180196762, -0.5658960342407227, 1.0508211851119995, 0.9441165328025818, -0.6911609172821045, 0.8859637975692749, -2.5333714485168457, 0.4163203835487366, 0.4062904119491577, 0.8418616652488708, -0.3480736017227173, 1.0703544616699219, -0.23477691411972046, 0.15572640299797058, 0.6683095693588257, 0.3685121536254883, 0.09709933400154114, -1.2388536930084229, -0.2653296887874603, -0.6031387448310852, -0.14638328552246094, 1.882110357284546, 1.8435869216918945, -0.7743715643882751, -0.1533500701189041, 0.13720880448818207, -0.9119325876235962, 0.19068209826946259, 0.7232171893119812, -0.4363362789154053, -0.18091541528701782, 0.8037789463996887, 1.3862531185150146]::DOUBLE[]) / 1.5) AS BIGINT), CAST(floor(list_dot_product(v, [-0.34849292039871216, 1.0537137985229492, 0.04988928139209747, 1.3674485683441162, 0.266739159822464, 0.02726016752421856, -0.8305160999298096, 0.398069828748703, 0.2347363531589508, 0.5199782252311707, -0.22443649172782898, 0.9518789649009705, -0.15361079573631287, -1.1594657897949219, 0.9177144169807434, -0.893778920173645, 0.07761112600564957, 0.9697328209877014, -0.4193418323993683, -0.03773541375994682, -0.4732300341129303, -0.8553707599639893, 2.2051830291748047, -0.665023148059845, 1.802297830581665, 0.7233623266220093, 0.8343656659126282, 1.5078867673873901, 1.8732773065567017, 0.17565734684467316, 0.8230498433113098, -1.0642009973526, -1.318501591682434, 0.395340234041214, 0.293815940618515, 0.9082454442977905, 0.03904242813587189, 0.41234463453292847, -0.8572762608528137, -0.40453556180000305, 0.9311183094978333, 0.44258368015289307, -0.7640608549118042, -1.0046799182891846, 1.148905873298645, 0.5823735594749451, -0.520154595375061, -0.9427458643913269, -1.192055344581604, 1.5780160427093506, 1.635623574256897, 0.9829002022743225, -0.8020071387290955, 0.7028918862342834, 0.5672862529754639, -1.0987393856048584, -0.2755938768386841, -1.4118257761001587, 0.1979110985994339, -1.1248174905776978, -0.43698686361312866, 0.3855377435684204, -1.891910195350647, 1.7424647808074951]::DOUBLE[]) / 1.5) AS BIGINT), CAST(floor(list_dot_product(v, [-0.31202271580696106, 0.5821118354797363, -0.6334365010261536, -0.14920179545879364, -0.05736998841166496, 0.983603835105896, -0.18690089881420135, -2.0826900005340576, -0.20208369195461273, -1.1284104585647583, -0.5027324557304382, 0.10121096670627594, -0.728154718875885, -0.9040981531143188, 1.7114681005477905, 0.0712539479136467, -0.5338642597198486, 0.16661366820335388, 0.0060435328632593155, 0.37528643012046814, 0.5705074071884155, 1.538831353187561, 2.705325126647949, 0.7253747582435608, -0.7094079256057739, 1.2062201499938965, 0.768677294254303, -1.1438981294631958, 0.3171178102493286, 0.9606594443321228, -1.6097266674041748, 0.5050792694091797, 0.5597531199455261, 0.8019219636917114, 0.021637611091136932, 0.014730824157595634, -0.5037999749183655, 0.2470065951347351, 0.0903347060084343, 1.154244303703308, 0.7311626672744751, -1.7981107234954834, 0.5763067007064819, 1.0139307975769043, -0.033065930008888245, 1.6079849004745483, 1.4417756795883179, -0.02226211503148079, -1.022802710533142, 0.96250319480896, -0.9653919339179993, -0.5667563080787659, -0.3535432517528534, -0.8305717706680298, 1.773634433746338, -0.04961287975311279, -0.7960098385810852, 1.45383882522583, 0.4728192090988159, -0.7233469486236572, -0.33057665824890137, 1.7535284757614136, -1.311445713043213, -0.5737663507461548]::DOUBLE[]) / 1.5) AS BIGINT)] AS k1,
               [CAST(floor(list_dot_product(v, [-0.8241427540779114, -0.6103533506393433, 2.382230043411255, -0.43710193037986755, -0.8144600987434387, -2.0368812084198, 0.15789292752742767, -1.9772672653198242, 0.6284728050231934, -0.8293935060501099, -1.4368078708648682, 0.32387498021125793, -1.6328206062316895, -1.1268798112869263, 0.4614917039871216, -0.9490178227424622, 0.9810025691986084, 0.07621489465236664, -2.166891574859619, 0.6219892501831055, -0.4008873701095581, 0.06683877110481262, -1.3856146335601807, -1.334600806236267, -1.136932134628296, 0.08227182179689407, 0.6753996014595032, -1.2204800844192505, 0.36436009407043457, 0.3667965233325958, 0.42024949193000793, -0.8009828329086304, 0.38146576285362244, 0.01568487100303173, 0.1547747403383255, 0.9197472333908081, 1.3063257932662964, 1.0133315324783325, 0.12238777428865433, -1.0648165941238403, 0.794286847114563, -0.2412629872560501, -0.13010607659816742, -0.6282954812049866, 0.35313525795936584, -1.013085961341858, -0.7972853779792786, 0.8670116662979126, -0.8381932377815247, -1.2974653244018555, 1.0274885892868042, 0.748957097530365, 1.991328239440918, 1.382330060005188, 1.0785114765167236, 0.9778203964233398, 1.2596721649169922, 0.006588878575712442, 1.245307445526123, -0.5754489302635193, 0.5575874447822571, 0.7728855013847351, 0.06482651829719543, 0.1365923136472702]::DOUBLE[]) / 1.5) AS BIGINT), CAST(floor(list_dot_product(v, [-0.4620949923992157, -2.3827058612369E-4, 1.4144649505615234, -0.6953024864196777, 1.19352388381958, 1.5873080492019653, 0.5756964087486267, 0.9319407939910889, -0.19255223870277405, 0.7357619404792786, -0.7618476748466492, -1.4761137962341309, 0.3855245113372803, 0.9551001787185669, 0.43418192863464355, -0.7130343317985535, 0.7291061282157898, 0.7140485048294067, 0.16467249393463135, 0.6545959115028381, 0.949684202671051, 1.5374349355697632, 0.11582717299461365, 1.2134251594543457, 0.36638012528419495, -1.0237579345703125, 1.406876802444458, 0.11267421394586563, -0.8768156170845032, 1.8153486251831055, -0.8449362516403198, -0.6664403080940247, 0.7297171950340271, -0.32806098461151123, 0.3753247857093811, -1.1018260717391968, 0.7453755140304565, 0.09608056396245956, -0.5979477167129517, 0.6103118658065796, -2.039558172225952, -1.3213967084884644, 0.3162570595741272, 0.285323828458786, 1.0480481386184692, -0.33974602818489075, -0.2620386779308319, 1.0626091957092285, 0.45096516609191895, 0.8640039563179016, 1.2982171773910522, -0.06409808993339539, 0.6046620607376099, 1.321499228477478, 1.2161407470703125, -0.4137933552265167, -2.065915107727051, -0.5511291027069092, -0.023591142147779465, -1.1753969192504883, 0.02615709789097309, 0.8924236297607422, -1.0139178037643433, -0.5098969340324402]::DOUBLE[]) / 1.5) AS BIGINT), CAST(floor(list_dot_product(v, [-0.42563918232917786, -0.9115563035011292, 0.3233068287372589, -0.24102407693862915, 0.720173716545105, -0.48257356882095337, 1.7274693250656128, -0.9636024832725525, 0.2232096791267395, 0.4768480062484741, 0.5300887823104858, 0.8810353875160217, -1.643686294555664, 0.5878630876541138, -0.9060510993003845, 0.7766035795211792, -1.086184024810791, 0.5926757454872131, -1.0061907768249512, -2.180358648300171, 1.2377214431762695, -0.2675033509731293, 0.40384426712989807, -1.060191035270691, -1.7655029296875, -1.3991986513137817, 1.3296188116073608, -0.6193493604660034, 0.08699188381433487, -1.3741285800933838, -0.7203410863876343, -1.0733850002288818, -0.25417110323905945, -0.6149559617042542, 0.38234075903892517, 0.05300561711192131, -1.1090883016586304, -1.3163747787475586, 1.080023169517517, -0.32063186168670654, 0.012690424919128418, -0.4900634288787842, 0.4765728712081909, -1.9092209339141846, -0.9842190742492676, 1.5312023162841797, 0.3694116473197937, -0.9647389054298401, 1.520045280456543, -1.1171633005142212, 1.0438013076782227, -1.4889960289001465, 0.3717333972454071, -1.5907796621322632, 1.9080140590667725, 1.396917700767517, -0.055467408150434494, -0.037926360964775085, -0.1738569736480713, -0.09965270757675171, 0.2648199200630188, 0.3110765814781189, -0.05159555375576019, 0.5971369743347168]::DOUBLE[]) / 1.5) AS BIGINT)] AS k2,
               [CAST(floor(list_dot_product(v, [0.8983801007270813, -0.4155026972293854, 1.1114035844802856, 1.8066707849502563, 0.7131825089454651, -0.48351961374282837, 0.3400031328201294, 0.15902526676654816, -1.6475319862365723, -0.2104584127664566, -0.6408950686454773, -0.6492632031440735, -0.5353641510009766, 0.2784917652606964, -0.08039521425962448, -0.30820873379707336, 0.7505158185958862, 1.275307297706604, 1.9871554374694824, -0.4157004952430725, 0.27419495582580566, -0.5716176629066467, 1.6139575242996216, 0.4792802035808563, -0.3134510815143585, 0.6888181567192078, 0.5612615346908569, -0.7192497253417969, -0.23883628845214844, -0.8245601058006287, -0.14678636193275452, 0.6171101927757263, 1.487562894821167, 1.1695780754089355, 2.746488094329834, -0.40977880358695984, 0.4116785228252411, -1.3022133111953735, 0.39003485441207886, 0.8058091998100281, 0.906391978263855, -1.6748417615890503, 0.2856680452823639, 0.4181322157382965, 0.3957855701446533, -0.3211224675178528, 0.26944491267204285, -0.22607792913913727, 0.6662774682044983, -0.7736185193061829, -0.6253801584243774, -0.3018474876880646, -0.3340805172920227, 1.343835711479187, -0.6179037094116211, -1.1147496700286865, 0.4456430673599243, 0.7541264295578003, -0.41587361693382263, -0.6689521670341492, -0.8638924956321716, 1.1517667770385742, 1.1312973499298096, -0.9118382930755615]::DOUBLE[]) / 1.5) AS BIGINT), CAST(floor(list_dot_product(v, [-0.5514251589775085, -2.3332507610321045, -0.4314097762107849, 0.12134326249361038, 1.6341205835342407, -0.21622881293296814, 0.007868790067732334, 0.8982653021812439, 0.1818816065788269, 0.2876715064048767, 0.1951146423816681, -0.005225745029747486, -0.8015927672386169, 1.4856964349746704, 0.739189863204956, 1.4003673791885376, 1.0600529909133911, -1.5340832471847534, 1.046739101409912, 0.19082854688167572, -0.008106467314064503, -1.3542943000793457, 0.31055137515068054, 0.1904643476009369, -1.360265851020813, -0.31839752197265625, 0.9768303632736206, -0.599986732006073, -0.9064708948135376, 0.9754791855812073, 0.008169874548912048, -0.10832535475492477, 0.4966016411781311, 0.8174757361412048, -0.5070240497589111, 0.8288398385047913, 0.6626270413398743, 0.2253219187259674, -2.620033025741577, 0.05177072435617447, -0.013297376222908497, 1.0915066003799438, -0.7391172051429749, 0.5275154113769531, -0.6842689514160156, -1.7181525230407715, 0.2811153829097748, 1.2865391969680786, -0.43460261821746826, 2.004756450653076, -0.07755306363105774, 0.25338679552078247, -1.1007755994796753, -0.9387260675430298, -1.1801379919052124, -0.19564275443553925, -1.3236335515975952, 0.6130489706993103, 2.313472270965576, -1.1512216329574585, -0.21176548302173615, 0.14130420982837677, -0.09694493561983109, 1.5430846214294434]::DOUBLE[]) / 1.5) AS BIGINT), CAST(floor(list_dot_product(v, [-0.2531697750091553, 0.6832418441772461, -0.8967571258544922, -0.10470906645059586, 0.7968146800994873, 0.8337447643280029, 0.5801885724067688, 1.4385645389556885, 0.3466525971889496, 1.0136826038360596, -0.4576115906238556, 0.550909698009491, -1.0972198247909546, -0.21979495882987976, -1.0740559101104736, 0.10204031318426132, -0.9691674113273621, -0.9043897986412048, 1.7838287353515625, -0.3297988176345825, 0.1177709624171257, 0.5077338218688965, -0.2809318006038666, -0.5578324198722839, 1.0062048435211182, 0.30785447359085083, -0.9700536727905273, 1.9974007606506348, 0.2712685167789459, 0.5642877221107483, -0.06818793714046478, 0.9611220359802246, -0.30446290969848633, 1.8474942445755005, 0.721655011177063, 0.0332292839884758, 0.7919476628303528, 1.674070954322815, 0.07074364274740219, -2.265246629714966, -0.8621333241462708, -1.952187418937683, -1.5112273693084717, 0.8041566610336304, 1.0489287376403809, 0.45267659425735474, 1.1567394733428955, -0.7212525010108948, 0.2693515717983246, 1.1419200897216797, -1.3110634088516235, 1.7871358394622803, -0.5988637804985046, 0.22407227754592896, 1.022426724433899, -0.394411563873291, 0.2810578942298889, -1.061490774154663, -1.363121509552002, 0.8242040276527405, -0.06329136341810226, -0.04003544896841049, -1.286466360092163, 0.4575636088848114]::DOUBLE[]) / 1.5) AS BIGINT)] AS k3
        FROM e),
cand AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                sqrt(greatest(
                  a.n - 2 * list_dot_product(a.v, b.v) + b.n, 0)) AS dist
         FROM sig a JOIN sig b
           ON a.vec_id < b.vec_id
          AND (a.k0 = b.k0 OR a.k1 = b.k1 OR a.k2 = b.k2 OR a.k3 = b.k3))
SELECT dist AS v FROM cand WHERE dist <= 1.20006"""),
    # q73a's rounded quantized cosine (3 queries x full corpus — no filter,
    # so the domain is every scorable pair)
    "q73a.sim": (4, """
        WITH e AS (SELECT vec_id, embedding FROM embeddings),
        sd AS (SELECT vec_id, embedding,
                      CASE WHEN m > 0 THEN m ELSE 1.0 END AS s
               FROM (SELECT vec_id, embedding,
                            list_max(list_transform(embedding, x -> abs(x))) / 127.0 AS m
                     FROM e)),
        qz AS (SELECT vec_id,
                      list_transform(embedding, x -> round(CAST(x AS DOUBLE) / s)) AS q
               FROM sd),
        n AS (SELECT vec_id, q, list_dot_product(q, q) AS nn FROM qz),
        qq AS (SELECT vec_id AS q_id, q AS qv, nn AS qn FROM n WHERE vec_id < 3)
        SELECT list_dot_product(qq.qv, n.q) / sqrt(qq.qn * n.nn) AS v
        FROM n JOIN qq ON n.vec_id <> qq.q_id"""),
    "q28.stop_ratio": (4, f"""
        WITH d AS (SELECT string_split_regex(trim(text), '\\s+') AS ts
                   FROM documents)
        SELECT len(list_filter(ts, t -> t IN ({_in_list(_stopwords())})))
               / len(ts) AS v
        FROM d WHERE len(ts) > 0"""),
    "q33.jaccard": (4, """
        WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ts
                   FROM documents WHERE doc_id < 1000),
        sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(ts)-2),
                        i -> ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3]))) AS shingle
               FROM d WHERE len(ts) >= 3),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
                  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
        SELECT CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS v
        FROM pairs
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.2"""),
    "q213.p": (4, """
        WITH l AS (SELECT lang, sum(n_chars) AS n FROM documents GROUP BY lang),
        t AS (SELECT sum(pow(CAST(n AS DOUBLE), 0.3)) AS z FROM l)
        SELECT pow(CAST(n AS DOUBLE), 0.3) / z AS v FROM l CROSS JOIN t"""),
    "q213.boost": (4, """
        WITH l AS (SELECT lang, sum(n_chars) AS n FROM documents GROUP BY lang),
        t AS (SELECT sum(pow(CAST(n AS DOUBLE), 0.3)) AS z,
                     sum(n) AS total FROM l)
        SELECT (pow(CAST(n AS DOUBLE), 0.3) / z)
               / (CAST(n AS DOUBLE) / total) AS v
        FROM l CROSS JOIN t"""),
    # q202 orders on the SAME rounded per-doc avg-logprob over the SAME
    # domain (all documents) — this probe guards both the q83 hash and
    # q202's ordering (its hashed bucket/cum columns are integer).
    "q83.avg_logprob": (4, """
        WITH t AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
                   FROM documents),
        tt AS (SELECT doc_id, token FROM t WHERE token <> ''),
        lm AS (SELECT token, count(*) AS cnt FROM tt GROUP BY token),
        tot AS (SELECT sum(cnt) AS total FROM lm)
        SELECT avg(ln(CAST(cnt AS DOUBLE) / total)) AS v
        FROM tt JOIN lm USING (token) CROSS JOIN tot
        GROUP BY doc_id"""),
    "q108.avg_logprob2": (4, """
        WITH pos AS (
          SELECT doc_id, i, arr[i] AS token
          FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS arr
                FROM documents) d,
               LATERAL (SELECT unnest(generate_series(1, len(arr))) AS i) g
          WHERE arr[i] <> ''),
        bg AS (SELECT a.doc_id, a.token AS ta, b.token AS tb
               FROM pos a JOIN pos b
                 ON a.doc_id = b.doc_id AND b.i = a.i + 1),
        lm AS (SELECT ta, tb, count(*) AS nab FROM bg GROUP BY 1, 2),
        ctx AS (SELECT ta, sum(nab) AS na FROM lm GROUP BY ta)
        SELECT avg(ln(CAST(nab AS DOUBLE) / na)) AS v
        FROM bg JOIN lm USING (ta, tb) JOIN ctx USING (ta)
        GROUP BY doc_id"""),
    "q118.med_qty": (4, """
        SELECT quantile_cont(l_quantity, 0.5) AS v FROM lineitem
        GROUP BY l_returnflag"""),
    "q118.mad_qty": (4, """
        WITH med AS (SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS m
                     FROM lineitem GROUP BY l_returnflag)
        SELECT quantile_cont(abs(l.l_quantity - m.m), 0.5) AS v
        FROM lineitem l JOIN med m ON l.l_returnflag = m.l_returnflag
        GROUP BY l.l_returnflag"""),
    # q118.iqr_price carries NO probe by design: rounding a ~5e4-magnitude
    # double at 4 dp can never clear REL_TOL (max boundary distance 5e-5 <
    # 1e-9 * 5e4), which is the guard telling us not to hash it.  The query
    # instead computes price quantiles on integer CENTS (exact quarters in
    # double under any interpolation formula) and divides once — bit-exact
    # with no rounding step, so there is no boundary to guard.
    "q119.char_entropy": (4, """
        WITH chars AS (
          SELECT doc_id, unnest(regexp_extract_all(text, '[\\s\\S]')) AS ch
          FROM documents WHERE length(text) > 0)
        SELECT entropy(ch) AS v FROM chars GROUP BY doc_id"""),
    # q121.value carries NO round() probe: over 420k interpolated values this
    # guard found hundreds within engine-round()-divergence distance of a
    # 4-dp boundary (Spark rounds via BigDecimal decimal strings, DuckDB via
    # double multiply — near-boundary inputs genuinely diverge).  The query
    # therefore quantizes with explicit floor(v*1e4 + 0.5)/1e4 on BOTH
    # sides: the same three IEEE ops on the same bits cannot diverge, even
    # for boundary-straddling inputs, so there is no boundary to guard.
    # q142 quantizes per-term BM25 weights with floor(w*1e4 + 0.5) on both
    # sides (the q121 same-ops convention), so the only cross-engine
    # divergence source is ln()'s libm ulp — this probe asserts no per-term
    # weight sits within noise of a .00005 quantization boundary. Domain =
    # exactly the (query-term, doc) pairs the retrieval join produces.
    "q142.term_weight": (4, """
        WITH t AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
                   FROM documents),
        tt AS (SELECT doc_id, term FROM t WHERE term <> ''),
        tfq AS (SELECT doc_id, term, count(*) AS tf FROM tt GROUP BY 1, 2),
        dlq AS (SELECT doc_id, count(*) AS dl FROM tt GROUP BY 1),
        dfq AS (SELECT term, count(*) AS df
                FROM (SELECT DISTINCT doc_id, term FROM tt) GROUP BY term),
        meta AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
                        (SELECT CAST(sum(dl) AS DOUBLE) FROM dlq) /
                          (SELECT count(*) FROM documents) AS avgdl),
        qraw AS (SELECT doc_id AS qid,
                        unnest((string_split_regex(trim(text), '\\s+'))[1:3]) AS term
                 FROM documents WHERE doc_id % 50 = 0),
        qt AS (SELECT DISTINCT qid, term FROM qraw WHERE term <> '')
        SELECT ln(1.0 + (CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
               * (CAST(tf AS DOUBLE) * 2.2)
               / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl))) AS v
        FROM qt
        JOIN tfq f ON qt.term = f.term
        JOIN dlq d ON f.doc_id = d.doc_id
        JOIN dfq g ON f.term = g.term
        CROSS JOIN meta m"""),
    "q84.score": (4, """
        WITH t AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
                   FROM documents),
        tt AS (SELECT doc_id, term FROM t WHERE term <> ''),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM tt GROUP BY 1, 2),
        df AS (SELECT term, count(*) AS df
               FROM (SELECT DISTINCT doc_id, term FROM tt) GROUP BY term),
        n AS (SELECT count(*) AS n_docs FROM documents)
        SELECT tf * ln(CAST(n_docs + 1 AS DOUBLE) / (df + 1)) AS v
        FROM tf JOIN df USING (term) CROSS JOIN n"""),
    # q152's priority values are exact decimal-string parses on the 0.1
    # grid (plus the 0.5 protocol default) — every value sits ON a
    # round(,1) grid point, 0.05 from the nearest half boundary, so this
    # probe is structurally safe at any SF; registered per the rounded-
    # double-column policy.
    "q152.priority": (1, """
        SELECT CAST(doc_id % 10 AS DOUBLE) / 10 AS v FROM documents
        WHERE doc_id % 5 <> 0
        UNION ALL SELECT 0.5 FROM documents"""),
}


def main():
    sf_dir = sys.argv[1]
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name in sorted(REGISTRY):
        if only and name not in only:
            continue
        k, sql = REGISTRY[name]
        scale = 10.0 ** k
        vals = [r[0] for r in con.execute(sql).fetchall()]
        worst = None  # (danger, v) over non-tie values
        n_checked = 0
        n_ties = 0
        for v in vals:
            if v is None or not math.isfinite(v):
                continue
            n_checked += 1
            frac = (v * scale) % 1.0
            if frac == 0.5:  # exact binary tie — both engines agree, safe
                n_ties += 1
                continue
            danger = abs(frac - 0.5) / scale
            if worst is None or danger < worst[0]:
                worst = (danger, v)
            if danger < max(REL_TOL * abs(v), ABS_FLOOR):
                print(f"FAIL {name}: v={v!r} sits {danger:.3e} from its "
                      f"{k}-dp round-half boundary (tol "
                      f"{max(REL_TOL * abs(v), ABS_FLOOR):.3e})")
                failures += 1
        wd = f"min_dist={worst[0]:.3e} at v={worst[1]:.6g}" if worst else "no near-tie values"
        print(f"{'WARN' if n_checked == 0 else 'OK  '} {name}: "
              f"{n_checked} values ({n_ties} exact ties), {wd}")

    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
