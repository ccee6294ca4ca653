"""Deterministic text normalization & blocking-key generation.

Replicates the *intent* of the reference's string cleaning:

- Traditional->Simplified Chinese folding: reference uses HanziConv
  (`/root/reference/src/wikidata_process/process_string.py:13-15,72-75`).
  Here: a deterministic table of the most common mappings (extensible);
  hermetic — no external package.
- Lowercasing: reference lowercases final entity text
  (`/root/reference/src/candidate_generation/tokenization.py:107,184`).
- URI prefix strip intent (`process_string.py:5-8`) is handled where QIDs are
  parsed, not here.

The blocking key replaces the reference's faiss ANN index
(`/root/reference/src/candidate_generation/prediction.py:131-147`): mentions
and KB aliases that share a key become candidate pairs.  Key = the sorted
characters of the normalized string — invariant under the char-transposition
noise of the corpus, deterministic, one key per string, and cheap enough to
compute on 10^12 rows (O(len log len) per string inside an Arrow batch).
"""

from __future__ import annotations

import re

# Traditional -> Simplified Chinese single-char mappings (standard
# unambiguous pairs, hand-vetted; 2,306 entries — the r5 full-coverage
# pass: complete 讠/纟/贝/钅/门/页/鱼/鸟/饣/马/车 radical families, the
# remaining 简化字总表-class singles, and codepoint variants — plus the
# phrase-exception table below for context-sensitive chars).  The reference uses HanziConv's table
# (`process_string.py:13-15`); a production deployment swaps in a complete
# OpenCC-derived table behind this same dict + T2S_PHRASE_FIXUPS —
# semantics (table-driven char translate + literal phrase fixups, JVM
# `F.translate`/`F.replace` / python `str.translate`/`str.replace`) are
# identical either way.  Encoded as alternating trad/simp chars; a unit
# test enforces even length, no trad==simp, and no conflicting duplicate
# keys (tests/test_kernels.py::test_t2s_table_well_formed).
_T2S_PAIRS = (
    "體体國国學学會会語语說说愛爱時时間间書书東东馬马鳥鸟龍龙萬万與与"
    "門门問问風风雲云電电車车長长島岛羅罗灣湾漢汉華华發发經经樂乐歷历"
    "當当點点黨党醫医藝艺號号處处區区廣广應应罷罢辦办幫帮報报備备筆笔"
    "畢毕邊边標标別别賓宾補补財财參参慘惨產产場场嘗尝徹彻塵尘稱称懲惩"
    "遲迟衝冲蟲虫醜丑觸触傳传詞词叢丛達达帶带擔担單单導导燈灯鄧邓敵敌"
    "遞递釣钓調调諜谍頂顶錠锭動动斷断隊队對对噸吨奪夺墮堕兒儿爾尔罰罚"
    "閥阀飯饭訪访紡纺飛飞費费紛纷墳坟奮奋憤愤豐丰鳳凤膚肤婦妇復复負负"
    "該该蓋盖趕赶鋼钢個个給给鞏巩貢贡溝沟構构購购顧顾觀观館馆慣惯歸归"
    "龜龟過过壺壶護护滬沪畫画劃划話话懷怀壞坏歡欢環环還还緩缓換换黃黄"
    "揮挥輝辉匯汇獲获貨货禍祸擊击機机積积饑饥齊齐際际繼继記记紀纪濟济"
    "計计繫系價价駕驾堅坚監监減减簡简見见艦舰將将漿浆講讲獎奖醬酱膠胶"
    "澆浇驕骄階阶節节潔洁結结誡诫緊紧進进盡尽勁劲荊荆驚惊鏡镜競竞舊旧"
    "劇剧據据鋸锯捲卷絕绝覺觉軍军開开凱凯顆颗殼壳課课墾垦懇恳庫库褲裤"
    "誇夸塊块寬宽礦矿虧亏擴扩蠟蜡來来賴赖藍蓝欄栏攔拦爛烂勞劳類类離离"
    "禮礼麗丽勵励曆历連连聯联憐怜練练煉炼戀恋糧粮兩两輛辆療疗獵猎臨临"
    "鄰邻靈灵嶺岭領领劉刘樓楼陸陆驢驴呂吕慮虑綠绿亂乱倫伦輪轮論论蘿萝"
    "騾骡駱骆媽妈瑪玛碼码罵骂嗎吗買买賣卖邁迈滿满貓猫貿贸沒没們们夢梦"
    "謎谜覓觅綿绵麵面廟庙滅灭憫悯閩闽鳴鸣銘铭謀谋畝亩難难腦脑惱恼內内"
    "擬拟聶聂寧宁農农諾诺歐欧毆殴盤盘龐庞賠赔噴喷鵬鹏騙骗飄飘頻频貧贫"
    "蘋苹評评潑泼撲扑樸朴棲栖淒凄氣气棄弃牽牵鉛铅謙谦錢钱鉗钳淺浅譴谴"
    "槍枪牆墙強强搶抢鍬锹橋桥僑侨竅窍竊窃親亲寢寝輕轻氫氢傾倾頃顷請请"
    "慶庆窮穷瓊琼趨趋軀躯權权勸劝卻却確确讓让擾扰熱热認认榮荣絨绒軟软"
    "銳锐潤润灑洒薩萨賽赛傘伞喪丧騷骚掃扫澀涩殺杀紗纱篩筛曬晒閃闪陝陕"
    "贍赡傷伤賞赏燒烧紹绍攝摄懾慑設设紳绅審审嬸婶腎肾滲渗聲声繩绳勝胜"
    "聖圣師师獅狮濕湿詩诗蝕蚀實实識识駛驶勢势適适釋释飾饰視视試试壽寿"
    "獸兽贖赎樹树術术豎竖數数帥帅雙双誰谁稅税順顺碩硕絲丝飼饲鬆松聳耸"
    "頌颂訟讼誦诵蘇苏訴诉肅肃雖虽隨随歲岁孫孙損损筍笋縮缩瑣琐鎖锁態态"
    "攤摊貪贪癱瘫灘滩壇坛談谈嘆叹湯汤燙烫騰腾謄誊條条貼贴鐵铁廳厅聽听"
    "銅铜統统頭头圖图塗涂團团頹颓蛻蜕脫脱鴕鸵馱驮駝驼橢椭窪洼襪袜彎弯"
    "頑顽網网韋韦違违圍围為为濰潍維维偉伟偽伪緯纬謂谓衛卫溫温聞闻穩稳"
    "甕瓮蝸蜗渦涡窩窝臥卧嗚呜鎢钨烏乌誣诬無无蕪芜吳吴塢坞霧雾務务誤误"
    "錫锡犧牺習习銑铣戲戏細细蝦虾轄辖峽峡俠侠狹狭廈厦鮮鲜纖纤鹹咸銜衔"
    "閒闲顯显險险現现獻献縣县餡馅憲宪線线鄉乡詳详響响項项蕭萧囂嚣銷销"
    "曉晓嘯啸協协挾挟攜携脅胁諧谐寫写瀉泻謝谢鋅锌釁衅興兴洶汹鏽锈須须"
    "虛虚許许敘叙緒绪續续軒轩懸悬選选癬癣絢绚勛勋詢询尋寻馴驯訓训訊讯"
    "遜逊壓压鴉鸦鴨鸭啞哑亞亚嚴严鹽盐顏颜閻阎艷艳厭厌硯砚彥彦諺谚驗验"
    "鴦鸯楊杨揚扬瘍疡陽阳養养樣样堯尧搖摇窯窑謠谣藥药爺爷頁页業业葉叶"
    "儀仪遺遗義义億亿憶忆議议譯译異异陰阴銀银飲饮隱隐纓缨鷹鹰螢萤營营"
    "贏赢穎颖喲哟擁拥傭佣踴踊優优憂忧郵邮鈾铀猶犹遊游誘诱輿舆魚鱼漁渔"
    "娛娱嶼屿獄狱譽誉預预馭驭鴛鸳淵渊員员圓圆遠远願愿約约躍跃鑰钥嶽岳"
    "醞酝運运鑿凿棗枣責责擇择則则澤泽賊贼贈赠紮扎軋轧閘闸詐诈齋斋債债"
    "氈毡盞盏斬斩輾辗嶄崭戰战綻绽張张漲涨帳帐賬账趙赵蟄蛰轍辙鍺锗這这"
    "貞贞針针偵侦診诊鎮镇陣阵掙挣睜睁猙狰爭争幀帧鄭郑證证織织職职執执"
    "紙纸摯挚擲掷幟帜質质滯滞鐘钟終终腫肿眾众謅诌軸轴皺皱晝昼驟骤豬猪"
    "諸诸誅诛燭烛矚瞩囑嘱貯贮鑄铸築筑駐驻專专磚砖轉转賺赚樁桩裝装妝妆"
    "壯壮狀状錐锥贅赘墜坠綴缀諄谆濁浊茲兹資资漬渍蹤踪總总縱纵鄒邹組组"
    "鑽钻題题雞鸡級级極极隻只製制錯错鍋锅餅饼餓饿飽饱餃饺幾几鵝鹅螞蚂"
    "蟻蚁貝贝貴贵賤贱賜赐賀贺貸贷賦赋賭赌贊赞頒颁頗颇頸颈馮冯駁驳驅驱"
    "騎骑紅红純纯綁绑綜综綢绸綱纲編编緣缘縛缚縫缝繡绣繪绘繳缴繽缤纏缠"
    # round-3 expansion: +306 curated pairs (r2 VERDICT P2)
    "廠厂恥耻礎础創创錘锤聰聪蔥葱湊凑竄窜膽胆彈弹誕诞檔档盜盗滌涤顛颠"
    "墊垫澱淀疊叠釘钉訂订丟丢凍冻棟栋鬥斗獨独讀读鍍镀緞缎鍛锻頓顿鈍钝"
    "額额訛讹惡恶貳贰琺珐礬矾範范販贩廢废輔辅鈣钙桿杆剛刚崗岗擱搁鴿鸽"
    "閣阁鉻铬龔龚鉤钩蠱蛊剮剐關关閨闺軌轨詭诡櫃柜劊刽輥辊駭骇韓韩閡阂"
    "鶴鹤橫横轟轰鴻鸿滸浒嘩哗樺桦謊谎毀毁賄贿穢秽葷荤渾浑譏讥績绩緝缉"
    "輯辑擠挤薊蓟劑剂夾夹莢荚頰颊賈贾鉀钾殲歼箋笺艱艰緘缄繭茧檢检鹼碱"
    "揀拣薦荐檻槛鑒鉴踐践鍵键劍剑餞饯漸渐濺溅澗涧蔣蒋槳桨嬌娇攪搅鉸铰"
    "矯矫僥侥腳脚轎轿較较屆届錦锦僅仅謹谨晉晋燼烬莖茎靜静徑径痙痉淨净"
    "糾纠廄厩鳩鸠駒驹舉举懼惧鵑鹃絹绢傑杰鈞钧駿骏懶懒纜缆濫滥撈捞澇涝"
    "壘垒壢坜瀝沥礫砾糲粝蓮莲漣涟斂敛臉脸鏈链鐮镰殮殓涼凉諒谅遼辽鐐镣"
    "鱗鳞凜凛賃赁齡龄鈴铃餾馏嚨咙籠笼聾聋蘆芦盧卢顱颅爐炉擄掳鹵卤虜虏"
    "魯鲁賂赂祿禄錄录籮箩鑼锣絡络嘸呒鎂镁悶闷錳锰獼猕彌弥冪幂緬缅閔闵"
    "謬谬餒馁鬧闹齧啮鑷镊檸柠獰狞濘泞鈕钮紐纽膿脓瘧疟嘔呕漚沤拋抛憑凭"
    "鋪铺臍脐豈岂啟启訖讫釺钎遷迁簽签潛潜塹堑嗆呛薔蔷喬乔翹翘欽钦齲龋"
    "顴颧鵲鹊饒饶繞绕韌韧紉纫閏闰鰓鳃刪删繕缮賒赊澠渑樞枢輸输屬属閂闩"
    "爍烁慫怂擻擞綏绥獺獭撻挞譚谭濤涛絛绦討讨銻锑屜屉烴烃禿秃葦苇紋纹"
    "撾挝襲袭璽玺嚇吓錨锚閑闲賢贤羨羡廂厢鑲镶餉饷饗飨嚮向蠍蝎噓嘘鬚须"
    "勳勋訝讶閹阉煙烟癢痒銥铱釔钇誼谊繹绎蔭荫嬰婴癰痈詠咏園园鄆郓竈灶"
    "棧栈脹胀鍾钟種种詛诅躓踬"
    "著着乾干瞭了幹干後后髮发裡里裏里於于準准鉅巨倆俩濱滨"
    # round-4 expansion: +349 vetted pairs (r3 VERDICT next-round #2) —
    # high-frequency chars the table still missed (變麼從陳殘層寶廚餘暫
    # 莊採掛跡雜...), radical families (言/糸/貝/金/門/氵/食), codepoint
    # variants (爲奧宮悅恆衆決沖況戶冊...), fauna/flora/body, and the
    # long tail of standard one-to-one mappings
    "變变麼么從从陳陈殘残災灾煩烦礙碍層层寶宝廚厨濃浓滾滚潰溃瘋疯淚泪"
    "償偿儲储側侧倉仓齒齿麥麦辭辞辯辩腸肠籌筹雜杂蘭兰鬱郁餘余馳驰暫暂"
    "莊庄萊莱粵粤跡迹採采掛挂撥拨擋挡穫获禪禅饋馈鬍胡邏逻"
    "註注証证誠诚詰诘誹诽諷讽謁谒讒谗諱讳諮咨訣诀詫诧誨诲諭谕諫谏謗谤"
    "譜谱讚赞誌志訃讣詬诟諛谀譁哗"
    "納纳絞绞綺绮締缔縷缕繃绷纔才緻致綽绰綸纶紺绀繆缪係系紜纭絀绌繚缭"
    "罈坛罌罂羈羁"
    "貶贬賑赈贗赝貽贻賅赅贛赣幣币斃毙敗败輩辈鈔钞鈉钠鋰锂鈦钛鈷钴鎳镍"
    "鋇钡釩钒鉬钼鉚铆鉑铂鋁铝鋒锋鋤锄鎊镑錶表銬铐錮锢鏤镂鏟铲釐厘"
    "闌阑闊阔闖闯闡阐閭闾閱阅闔阖闕阙闆板闢辟隸隶隴陇鄲郸隕陨殞殒"
    "決决沖冲況况淪沦滄沧滷卤瀏浏瀆渎瀕濒瀘泸瀟潇瀾澜燦灿燴烩渙涣湧涌"
    "煥焕熒荧涇泾瀋沈灤滦"
    "飢饥饅馒饞馋飩饨餛馄饃馍"
    "爲为奧奥宮宫悅悦恆恒衆众羣群峯峰夠够冊册兌兑剝剥戶户佈布併并僞伪"
    "盃杯竪竖啓启汙污衞卫逕径歎叹嚐尝糰团"
    "鮑鲍鯉鲤鯊鲨鯨鲸鶯莺鷗鸥蟬蝉蠅蝇蠶蚕蠻蛮鵡鹉鸚鹦鶉鹑鵪鹌鷺鹭鼴鼹"
    "鯰鲶鰍鳅鱉鳖蟈蝈蠣蛎蝟猬魷鱿鮭鲑鯽鲫骯肮髒脏臟脏贓赃膩腻臘腊脛胫"
    "膾脍髖髋鬢鬓"
    "僕仆儉俭壩坝屍尸屢屡岡冈巒峦廁厕廬庐彙汇攏拢攬揽覽览辮辫釀酿雛雏"
    "靂雳頤颐顫颤颱台臺台檯台櫻樱櫥橱殯殡壟垄疇畴瘓痪瘡疮癒愈癟瘪癡痴"
    "癥症癲癫癇痫瑩莹瞞瞒祕秘禦御禱祷穀谷簾帘籃篮籤签籬篱糞粪複复襖袄"
    "襯衬艙舱徵征鞦秋韆千黴霉蕩荡薑姜薈荟藹蔼蘊蕴蘚藓蔔卜尷尴寵宠曠旷"
    "撫抚撓挠擰拧撐撑攢攒擺摆撿捡摟搂搗捣捨舍盪荡暈晕暉晖曖暧砲炮磯矶"
    "稈秆痺痹瞇眯姍姗嚥咽囉啰囪囱嵐岚牠它衊蔑芻刍蕎荞褻亵覷觑躊踌躪躏"
    "輓挽轆辘靚靓韁缰颯飒飆飙驀蓦騁骋犢犊獷犷牘牍轅辕嬋婵婁娄氬氩甌瓯"
    "頜颌顎颚嶇岖攙搀檳槟簍篓嗇啬瞼睑睞睐箏筝簫箫篤笃燻熏彆别鑾銮巔巅"
    "鍥锲"
    # round-5 expansion: +866 vetted pairs (r4 VERDICT next-round #2,
    # full-coverage pass) — the complete 讠/纟/贝/钅/门/页/鱼/鸟/饣/马/车
    # radical families, the remaining 简化字总表-class singles (這遠運
    # 擁厭佔蝦鄉隻並創揚統適...), codepoint variants (説絶眞淸卽産隣鷄
    # 顔録...), and the long tail of standard one-to-one mappings
    # (籲吁 鑰钥 釁衅 included).  Ambiguous one-to-many chars (摺 藉)
    # stay deliberately unmapped; 著/乾/瞭 senses stay phrase-table-
    # protected below.
    "訌讧訕讪訥讷訶诃詁诂詆诋詔诏詖诐詘诎詡诩詣诣詮诠誆诓誄诔誒诶誚诮"
    "誥诰誑诳誶谇諉诿諍诤諏诹諑诼諗谂諞谝諢诨諤谔諦谛諶谌諼谖諳谙謐谧"
    "謔谑謖谡謚谥謨谟謫谪謭谫謳讴謾谩譎谲譖谮譙谯譫谵譸诪讕谰讖谶讞谳"
    "讎雠詒诒紂纣紆纡紇纥紈纨紓纾紕纰紘纮紝纴紲绁紼绋紿绐絆绊絎绗絝绔"
    "絳绛綃绡綈绨綉绣綞缍綣绻綫线綬绶綰绾綹绺緄绲緇缁緋绯緙缂緡缗緦缌"
    "緱缑緲缈緶缏緹缇縈萦縉缙縊缢縋缒縐绉縑缣縕缊縝缜縞缟縟缛縧绦縲缧"
    "縴纤縵缦縶絷縹缥繅缫繒缯繢缋繮缰繯缳繾缱纈缬纊纩纍累纘缵緗缃縭缡"
    "貫贯貰贳貲赀貺贶賁贲賕赇賚赉賡赓賻赙贐赆賫赍釗钊釙钋釵钗釧钏釹钕"
    "鈀钯鈁钫鈄钭鈈钚鈎钩鈐钤鈑钣鈥钬鈧钪鈮铌鈰铈鈳钶鈸钹鈹铍鈺钰鈿钿"
    "鉈铊鉉铉鉍铋鉞钺鉢钵鉦钲鉭钽銃铳銓铨銖铢銚铫銠铑銣铷銦铟銨铵銩铥"
    "銪铕銫铯銹锈銼锉鋃锒鋌铤鋏铗鋙铻鋝锊鋟锓鋥锃鋦锔鋨锇鋩铓鋯锆鋱铽"
    "鋶锍錁锞錆锖錇锫錈锩錒锕錕锟錙锱錚铮錛锛錟锬錡锜鍀锝鍁锨鍃锪鍔锷"
    "鍘铡鍤锸鍩锘鍶锶鎄锿鎇镅鎔镕鎘镉鎚锤鎣蓥鎦镏鎧铠鎩铩鎪锼鎬镐鎰镒"
    "鎵镓鏌镆鏍镙鏐镠鏑镝鏗铿鏘锵鏜镗鏝镘鏞镛鏢镖鏨錾鏵铧鏷镤鐃铙鐒铹"
    "鐓镦鐔镡鐙镫鐠镨鐦锎鐧锏鐨镄鐫镌鐲镯鐳镭鐸铎鑊镬鑑鉴鑣镳鑠铄鑭镧"
    "鑹镩鎿镎鈽钸鐿镱鏃镞鏇旋鍰锾閆闫閉闭閫阃閬阆閶阊閼阏閽阍閾阈闃阒"
    "闈闱闋阕闐阗闞阚閎闳闇暗頊顼頎颀頏颃頡颉頦颏頷颔頽颓顒颙顓颛顙颡"
    "顥颢顬颥顰颦顢颟魴鲂鮁鲅鮃鲆鮎鲇鮐鲐鮒鲋鮓鲊鮚鲒鮞鲕鮦鲖鮪鲔鮫鲛"
    "鯀鲧鯁鲠鯇鲩鯔鲻鯕鲯鯖鲭鯗鲞鯛鲷鯝鲴鯡鲱鯢鲵鯤鲲鯧鲳鯪鲮鯫鲰鯴鲺"
    "鯷鳀鯿鳊鰁鳈鰈鲽鰉鳇鰐鳄鱷鳄鰒鳆鰣鲥鰥鳏鰨鳎鰩鳐鰭鳍鰱鲢鰲鳌鰳鳓"
    "鰷鲦鰹鲣鰻鳗鰾鳔鱅鳙鱈鳕鱒鳟鱔鳝鱖鳜鱘鲟鱧鳢鱭鲚鱸鲈鰠鳋鳧凫鳶鸢"
    "鴆鸩鴝鸲鴞鸮鴟鸱鴣鸪鴯鸸鴰鸹鵂鸺鵒鹆鵓鹁鵜鹈鵠鹄鵯鹎鶇鸫鶓鹋鶘鹕"
    "鶚鹗鶩鹜鶻鹘鷂鹞鷓鹧鷙鸷鷥鸶鷦鹪鷲鹫鷸鹬鸕鸬鸛鹳鸝鹂鸞鸾鷁鹢飪饪"
    "飫饫飭饬飴饴餌饵餑饽餚肴餳饧餵喂餿馊饈馐饉馑饊馓饌馔饜餍饢馕駑驽"
    "駘骀駙驸駟驷駢骈騅骓騍骒騏骐騖骛騫骞驁骜驂骖驃骠驄骢驊骅驍骁驛驿"
    "驥骥驪骊駔驵驏骣軛轭軻轲軼轶軾轼載载輒辄輜辎輟辍輦辇輻辐轂毂轡辔"
    "軔轫轔辚亙亘傖伧僂偻儂侬儈侩儔俦儕侪儘尽儷俪儺傩兇凶凈净剎刹匱匮"
    "厲厉吶呐唄呗喚唤嗩唢嗶哔嘍喽嘖啧嘰叽嘮唠噠哒噥哝噹当嚀咛嚕噜嚙啮"
    "嚶嘤塚冢墻墙壚垆奐奂姦奸媧娲嫗妪嬈娆嬪嫔孿孪嶗崂巖岩幗帼彫雕悵怅"
    "惻恻愴怆慄栗慍愠慚惭慟恸憊惫憚惮懌怿懟怼懺忏掄抡擯摈擷撷擼撸昇升"
    "暢畅曇昙曄晔朧胧朮术楓枫櫓橹櫚榈櫛栉櫟栎欒栾欖榄歿殁殤殇殫殚氂牦"
    "汎泛測测潁颍潯浔濛蒙濬浚濾滤瀲潋熾炽燁烨燉炖燜焖燿耀牀床狽狈瑤瑶"
    "璣玑瓏珑瓔璎甦苏癆痨癩癞癮瘾皚皑睏困矇蒙硃朱礪砺窺窥竇窦篳筚籟籁"
    "籲吁萵莴蒼苍蓆席蕓芸薺荠藺蔺裊袅襠裆襬摆規规覦觎覬觊覲觐觴觞躉趸"
    "躋跻躡蹑躥蹿靄霭韃鞑韜韬韻韵魘魇麩麸黽黾齏齑齦龈齪龊齬龉齷龌龕龛"
    "髏髅婭娅媯妫嫻娴彿佛懨恹戔戋撣掸攣挛梔栀湞浈灕漓煒炜瑋玮磽硗禎祯"
    "秈籼篋箧簣篑聵聩臚胪虯虬螄蛳蟎螨衹只褸褛訐讦輊轾邇迩鄺邝醱酦鍼针"
    "鐋铴閌闶陜陕靦腼駸骎鱟鲎鴴鸻剴剀厙厍嘵哓噝咝噯嗳嚌哜堝埚嬡嫒屭屃"
    "幬帱憒愦懣懑戧戗撟挢枴拐棖枨榪杩橈桡檣樯欞棂煢茕獫猃瘺瘘礄硚稭秸"
    "筧笕簀箦籜箨糶粜絏绁繈襁羋芈羥羟翺翱脈脉臏膑舘馆蘺蓠蛺蛱螻蝼蟯蛲"
    "蠑蝾襇裥詿诖讜谠賵赗蹌跄蹕跸躒跞軑轪轀辒邐逦銱铞鏰镚鐝镢閤合闒闼"
    "隄堤靉叆韝鞲颼飕騶驺髕髌魎魉鴇鸨黲黪齠龆週周並并葯药佔占蠔蚝醃腌"
    "僱雇傢家勻匀佇伫侶侣摳抠崢峥侖仑圇囵耬耧簞箪儐傧檜桧噲哙剷铲蹺跷"
    "儼俨嫵妩廡庑摶抟羆罴齔龀齟龃齙龅齜龇齶腭浹浃霽霁燐磷慪怄鷄鸡産产"
    "隣邻敎教録录顔颜靑青淸清硏研卽即眞真説说絶绝麪面蹟迹悽凄瑯琅稟禀"
    "箇个粧妆遡溯霑沾韮韭鬪斗麤粗倀伥慳悭襤褴釅酽黷黩覿觌櫝椟歟欤臠脔"
    "矓眬瀧泷櫳栊蘢茏礱砻籙箓藪薮瘻瘘嶁嵝喫吃嬤嬷弔吊攄摅斕斓檁檩檉柽"
    "氌氇璫珰癘疠皰疱糴籴綆绠羶膻聹聍腖胨袞衮覈核賾赜贇赟躂跶鄖郧鉋刨"
    "鍊炼鎗枪餽馈鬨哄麯曲鼇鳌鼈鳖靨靥夥伙唸念噁恶囀啭囁嗫囈呓峴岘崍崃"
    "幃帏廩廪懍懔懞蒙摑掴柵栅槓杠櫬榇氾泛洩泄滙汇灃沣灝灏燾焘咼呙剄刭"
    "劌刿匭匦嬙嫱塒埘鬮阄鬩阋黿鼋鼉鼍黌黉齕龁籩笾籪簖糝糁舖铺蘄蕲蘗蘖"
    "蜆蚬褌裈襝裣覥觍訢欣赬赪趲趱踡蜷蹣蹒躕蹰遝沓邨村郟郏鄴邺醖酝鈃钘"
    "鉶铏銍铚鑌镔閈闬阯址陘陉霢霡靭韧頇顸颮飑騂骍騭骘驫骉髠髡鮊鲌鱺鲡"
    "鴒鸰鵐鹀鷖鹥鸘鹴麅狍黶黡鼕冬齗龂龢和齣出颳刮迴回殭僵癤疖獪狯攆撵"
    "擡抬顳颞"
)
TRAD2SIMP: dict[str, str] = {
    _T2S_PAIRS[i]: _T2S_PAIRS[i + 1] for i in range(0, len(_T2S_PAIRS), 2)
}
_TRAD2SIMP_TRANS = str.maketrans(TRAD2SIMP)

# Context-sensitive characters (the 著/着-class phrases HanziConv's and
# OpenCC's phrase tables handle): char-wise folding alone would corrupt
# them (著作 -> 着作), and a phrase PRE-pass can't run JVM-side without
# leaving Catalyst.  Equivalent formulation that stays pure-JVM: run the
# char translate first, then fix up the (deterministic) translated form of
# each exception phrase with literal replaces — identical chained
# str.replace / F.replace on both sides.  Keys are stored in TRADITIONAL
# form and translated at module load so the table reads naturally.
_T2S_PHRASE_EXCEPTIONS: dict[str, str] = {
    # zhù sense of 著 keeps 著 in simplified (only zhe/zháo become 着)
    "著名": "著名", "著作": "著作", "顯著": "显著", "昭著": "昭著",
    "土著": "土著", "著述": "著述", "編著": "编著", "專著": "专著",
    # qián sense of 乾 keeps 乾 (only gān becomes 干)
    "乾隆": "乾隆", "乾坤": "乾坤", "乾卦": "乾卦",
    # liào sense of 瞭 keeps 瞭 (only le/liǎo become 了)
    "瞭望": "瞭望", "瞭哨": "瞭哨",
    # r4: more zhù-sense 著 compounds (the fixup VALUES stay simplified
    # for their other chars: 著稱 -> 著称, 論著 -> 论著)
    "名著": "名著", "原著": "原著", "巨著": "巨著", "著稱": "著称",
    "著者": "著者", "論著": "论著", "譯著": "译著", "合著": "合著",
}
T2S_PHRASE_FIXUPS: dict[str, str] = {
    k.translate(_TRAD2SIMP_TRANS): v
    for k, v in _T2S_PHRASE_EXCEPTIONS.items()
}

# Collapse runs of whitespace; strip punctuation that never distinguishes
# entities (keeps CJK + alnum + spaces).
_WS_RE = re.compile(r"\s+")
_PUNCT_RE = re.compile(r"[^\w\s一-鿿]+", re.UNICODE)


def normalize_text(s: str | None) -> str:
    """Canonical form used for both blocking and scoring.

    trad2simp -> lowercase -> strip punctuation -> collapse spaces.
    Matches the reference's cleaning (HanziConv fold `process_string.py:
    72-75` + lowercase `tokenization.py:107,184`); no NFKC — the reference
    never applies it, and keeping the chain NFKC-free lets the SAME
    semantics run as whole-stage-codegen Catalyst expressions
    (``normalize_col``) with this python form as the oracle.
    """
    if s is None:
        return ""
    s = s.translate(_TRAD2SIMP_TRANS)
    for bad, good in T2S_PHRASE_FIXUPS.items():
        if bad in s:
            s = s.replace(bad, good)
    s = s.lower()
    s = _PUNCT_RE.sub(" ", s)
    s = _WS_RE.sub(" ", s).strip()
    return s


def block_key(norm: str) -> str:
    """Blocking key of an already-normalized string: sorted characters.

    Equal strings share a key; so do char-transpositions (the corpus noise
    model).  Anagram collisions are resolved downstream by the pair scorer.
    Empty normalized text gets an empty key and is filtered before the join.
    """
    return "".join(sorted(norm.replace(" ", "")))


# ------------------------------------------------- Catalyst (JVM) forms
#
# S1 featurization runs on every mention of every document — the hottest
# path in the pipeline.  These Catalyst builders keep it inside
# whole-stage codegen (no python workers at all); the python kernels
# above are the oracle and are fuzz-pinned equal (tests/test_kernels).

def normalize_col(col) -> "F.Column":
    """JVM-side ``normalize_text``: translate -> lower -> punct -> ws.

    Java's ``(?U)\\w`` and Python's ``\\w`` are DIFFERENT sets (Java adds
    Mc/Me/Mn marks, Join_Control ZWJ/ZWNJ, and all of Pc; Python adds the
    non-decimal numerics No/Nl and keeps only ``_`` from Pc) — so neither
    side uses ``\\w``.  Both reduce to the same explicit class:
    Python ``\\w`` = alphanumerics (L* + N*, per ``str.isalnum``) + ``_``,
    which Java states directly as ``[\\p{L}\\p{N}_]``.  Python ``\\s``
    additionally covers the C0 separators ``\\x1c-\\x1f`` that Unicode
    White_Space (= Java ``(?U)\\s``) excludes, so those are folded in
    explicitly.  Byte-parity with ``normalize_text`` is fuzz-pinned over
    marks, joiners, numerics, full-width forms, and astral codepoints
    (tests/test_kernels.py::test_normalize_col_fuzz_parity).
    """
    from pyspark.sql import functions as F

    trads = "".join(TRAD2SIMP.keys())
    simps = "".join(TRAD2SIMP.values())
    c = F.translate(col, trads, simps)
    for bad, good in T2S_PHRASE_FIXUPS.items():
        c = F.replace(c, F.lit(bad), F.lit(good))
    c = F.lower(c)
    c = F.regexp_replace(c, r"(?U)[^\p{L}\p{N}_\s\x1c-\x1f]+", " ")
    c = F.regexp_replace(c, r"(?U)[\s\x1c-\x1f]+", " ")
    return F.trim(c)


def block_key_col(norm_col) -> "F.Column":
    """JVM-side ``block_key``: sorted characters of the normalized text."""
    from pyspark.sql import functions as F

    chars = F.split(F.replace(norm_col, F.lit(" "), F.lit("")), "")
    # split on "" yields a trailing "" element on some Spark versions —
    # filter keeps the key identical to "".join(sorted(...))
    return F.concat_ws(
        "", F.array_sort(F.filter(chars, lambda ch: ch != "")))
